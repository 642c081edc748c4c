from audio_pattern_discovery_tpu.io.wavio import read_wav, write_wav  # noqa: F401
from audio_pattern_discovery_tpu.io.corpus import (  # noqa: F401
    Clip,
    load_corpus,
    pad_and_stack,
)
