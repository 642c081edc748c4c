from audio_pattern_discovery_tpu.models.autoencoder import (  # noqa: F401
    AutoEncoder,
    FeatureScaler,
    TrainState,
    encode_frames,
    train_autoencoder,
)
