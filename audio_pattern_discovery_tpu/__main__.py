from audio_pattern_discovery_tpu.cli import main

raise SystemExit(main())
