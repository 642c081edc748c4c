"""audio_pattern_discovery_tpu: TPU-native audio pattern discovery.

A brand-new JAX/XLA/Pallas framework with the capabilities of
dkohlsdorf/audio_pattern_discovery (Rust, CPU): unsupervised discovery of
recurring patterns in collections of audio recordings.  Public entry point
(preserved from the reference, BASELINE.json north_star): a directory of WAV
files in -> discovered pattern clusters + DTW alignments out.

See SURVEY.md for the structural analysis (and its SS0 provenance caveat:
the reference mount was empty at survey time, so reference citations are to
the driver-authored capability spec, not file:line).
"""

__version__ = "0.1.0"

from audio_pattern_discovery_tpu.config import PipelineConfig  # noqa: F401
