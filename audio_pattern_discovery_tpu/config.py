"""Typed configuration for the audio-pattern-discovery pipeline.

Every knob of the reference pipeline (SURVEY.md SS3 rows 2-8: window/hop,
AE dims/epochs, DTW band width, clustering linkage/threshold) is represented
here so reference behavior can be reproduced exactly.  The reference
(dkohlsdorf/audio_pattern_discovery, Rust CLI) drives these from CLI
args/config file; we use a single nested dataclass serializable to/from JSON.

NOTE on provenance: the reference mount was empty at survey time
(SURVEY.md SS0), so defaults follow the capability spec in BASELINE.json
rather than verified reference file:line citations.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass
class SpectrogramConfig:
    """Windowed FFT / spectrogram extraction (SURVEY.md SS3 row 2)."""

    sample_rate: int = 44_100
    win_length: int = 1024          # frame length in samples
    hop_length: int = 256           # hop in samples
    window: str = "hann"            # "hann" | "hamming" | "rect"
    n_fft: int | None = None        # defaults to win_length
    power: float = 2.0              # 1.0 = magnitude, 2.0 = power
    log_scale: bool = True          # log10 compression
    log_floor: float = 1e-10        # clamp before log
    normalize_signal: bool = True   # peak-normalize each clip to [-1, 1]
    # Optional dimensionality cap on frequency bins (keep lowest `max_bins`).
    max_bins: int | None = None
    # "matmul" computes the real DFT as an MXU matmul (TPUs have no FFT
    # unit; XLA's rfft lowers to a slow generic custom call); "rfft" keeps
    # the library FFT.  Equal within float tolerance (tested).
    fft_impl: str = "matmul"
    # MXU pass count for the DFT matmul: "high" (3-pass bf16, ~1e-5 relative
    # error, the default), "highest" (6-pass, reference-exact), "default"
    # (1-pass bf16, ~1e-2 — fastest, fine for exploratory runs).  The DFT is
    # the spectrogram stage's FLOP hot spot, so this is its throughput knob.
    fft_precision: str = "high"
    # Host->device sample encoding for the streaming tiles.  "auto" ships
    # plain-PCM16 corpora as int16 (half of f32 bandwidth, bit-exact device
    # decode) and everything else as f32.  "mulaw8" ships 8-bit mu-law
    # (mu=255) of the peak-normalized signal — HALF of int16 again; the
    # ~38 dB companding SNR sits far above the -20 dB segmentation gate and
    # the log-power feature scale, and discovery quality is gated equal to
    # the int16 path on planted corpora (tests).  For upload-bandwidth-bound
    # runs (hours of audio through a thin link, BASELINE config 5).
    upload_codec: str = "auto"      # "auto" | "mulaw8"
    # Streaming tile shape for corpus extraction: [clip_batch, chunk_frames]
    # device tiles give ONE compiled program for any corpus and bound device
    # memory for hours-long recordings (BASELINE config 5; SS8 P1).
    # chunk_frames swept on-chip: 1024 -> 67k frames/s, 2048 -> 73.6k,
    # 4096 -> 73.6k; 2048 is the knee (fewer dispatch RPCs per corpus).
    clip_batch: int = 16
    chunk_frames: int = 2048
    # HBM budget for keeping the assembled [B, F_max, bins] corpus device-
    # resident (skips the full download + segment re-upload); corpora above
    # this assemble on host instead (bounded by host RAM, not HBM).
    max_resident_bytes: int = 4 << 30
    # Feature head after the power spectrum (SURVEY.md SS3 row 2 — the
    # "additional modules" insurance note): "bins" keeps the (log-)power
    # spectrogram; "mel" projects onto a triangular HTK-scale mel
    # filterbank — one extra [bins, n_mels] MXU matmul fused into the
    # spectrogram tile; "mfcc" adds an orthonormal DCT-II over the log-mel
    # bands (a second tiny matmul).  The segmentation energy gate always
    # operates on the RAW power spectrum, so the segment table is
    # feature-invariant (tested).  For "mfcc" the mel log-compression is
    # definitional and applied regardless of log_scale.
    feature: str = "bins"           # "bins" | "mel" | "mfcc"
    # Mixed-rate corpora: "warn" (default) logs and proceeds — window/hop
    # are in samples, so off-rate clips land on a different time/frequency
    # scale; "auto" polyphase-resamples every off-rate clip to sample_rate
    # at load (io/resample.py; host-side — fewer bytes ever ship to the
    # device when downsampling).
    resample: str = "warn"          # "warn" | "auto"
    n_mels: int = 64
    n_mfcc: int = 20
    fmin: float = 0.0               # mel filterbank low edge (Hz)
    fmax: float | None = None       # high edge; None = capped-bin Nyquist

    @property
    def fft_size(self) -> int:
        return self.n_fft or self.win_length

    @property
    def n_bins(self) -> int:
        full = self.fft_size // 2 + 1
        return min(full, self.max_bins) if self.max_bins else full

    @property
    def feature_dim(self) -> int:
        """Last-axis size of the feature arrays this config produces."""
        if self.feature == "mfcc":
            return self.n_mfcc
        if self.feature == "mel":
            return self.n_mels
        return self.n_bins


@dataclass
class SegmentationConfig:
    """Slicing spectrograms into candidate pattern segments (SS3 row 3)."""

    method: str = "energy"          # "energy" | "sliding"
    # -- energy method --
    threshold_db: float = -20.0     # energy gate in dB relative to clip peak
    # Absolute energy floor (dB re. full-scale power): frames below this are
    # never active, so silent/uniform clips yield no junk segments.
    min_energy_db: float = -90.0
    min_len_frames: int = 8         # discard segments shorter than this
    max_len_frames: int = 256       # split segments longer than this
    merge_gap_frames: int = 4       # merge active runs separated by <= gap
    # -- sliding-window method --
    window_frames: int = 64
    stride_frames: int = 32


@dataclass
class AutoencoderConfig:
    """Autoencoder over spectrogram frames (SS3 row 4)."""

    latent_dim: int = 16
    hidden_dims: tuple[int, ...] = (256, 64)
    activation: str = "relu"        # "relu" | "tanh" | "gelu"
    denoising_std: float = 0.0      # >0 enables denoising AE
    learning_rate: float = 1e-3
    batch_size: int = 1024
    epochs: int = 20
    seed: int = 0
    dtype: str = "float32"          # compute dtype ("bfloat16" on TPU ok)
    # If False the pipeline runs DTW over raw spectrogram frames (the
    # minimum end-to-end slice, SURVEY.md SS8 P3).
    enabled: bool = True
    # Embedding method when enabled: "ae" trains the autoencoder; "pca"
    # computes a deterministic PCA(-whitening) projection to latent_dim
    # components instead — no training loop, one covariance matmul on
    # device plus a tiny host eigensolve (models/pca.py).  Same
    # checkpoint/update semantics as the AE (the frozen projection is what
    # keeps reused distances valid).
    method: str = "ae"              # "ae" | "pca"
    pca_whiten: bool = True
    # Temporal context: the embedder input for each frame is the (2k+1)-frame
    # spectrogram SLICE centered on it (concatenated along the feature axis,
    # edges clamped within the segment; ops/context.py).  0 = single frames
    # (the default, prior behavior).  The DTW contract is unchanged — one
    # latent per frame — the latent just sees local temporal structure.
    context_frames: int = 0
    # Orbax checkpoint/resume (SURVEY.md SS6.4): with `checkpoint` on and an
    # out_dir given, the trained state+scaler persist under
    # out_dir/<checkpoint_dir>; an existing checkpoint is restored instead
    # of retraining.
    checkpoint: bool = False
    checkpoint_dir: str = "ae_ckpt"
    # Upload/training overlap for long corpora (BASELINE config 5): with
    # f in (0, 1), the AE trains on the FIRST ceil(f * n_clips) clips'
    # segment frames (scaler fitted on the same subset), launched
    # asynchronously while the remaining clips' spectrogram tiles still
    # upload — the device interleaves epoch programs with tile programs,
    # hiding AE training inside the upload-bound stage.  0 (default)
    # trains on every segment after the full corpus lands (exact prior
    # behavior).  Training on a clip prefix changes the learned embedding
    # (quality-gated in tools/field_bench.py, not bit-identical), so the
    # knob enters the update/query fingerprint like any other AE knob.
    overlap_clip_fraction: float = 0.0


@dataclass
class DTWConfig:
    """Dynamic-time-warping alignment (SS3 rows 5-6)."""

    band: int | None = None         # Sakoe-Chiba band half-width; None = full
    # Band semantics for length-mismatched pairs (oracle/dtw.py docstring):
    # "diag" (default) = the classical scaled corridor around the
    # corner-to-corner diagonal — half-width stays O(band) regardless of
    # |len_a - len_b|, which keeps the lane kernel's stripe narrow;
    # "widen" = |i - j| <= max(band, |len_a - len_b|) (rounds 1-3 default),
    # kept for comparability and for the stripe/square kernel routes.
    band_mode: str = "diag"
    auto_widen_band: bool = True    # ("widen" mode) widen to >= |len_a-len_b|
    metric: str = "euclidean"       # "euclidean" | "sqeuclidean" | "cosine"
    normalize: str = "path_len"     # "none" | "path_len" (divide by N+M)
    # Pair-batching knobs for the TPU kernel.  Large dispatches amortize the
    # per-call overhead (measured ~27 ms RPC floor on the tunneled backend);
    # the scheduler clamps this to the corpus's own pair count, so small
    # corpora are unaffected.
    # Pairs per device dispatch: bigger blocks amortize dispatch RPCs and
    # per-block host work (measured 444k -> 547k+ pairs/s at the 50M-pair
    # scale going 32k -> 128k); the scheduler caps each block's device
    # gather at ~2 GiB so long buckets stay safe, and small corpora clamp
    # to their own pair count.
    pair_batch: int = 131_072
    # Diag lane kernel chain interleaving: pack this many consecutive
    # (length-sorted, so near-equal) A-rows into one kernel program as
    # independent DP chains traced interleaved — fills the VPU pipeline
    # where the narrow-stripe per-row dependency chain is latency-bound
    # (ops/dtw_pallas._dtw_lane_diag_kernel).  Results are bitwise-stable
    # in this knob (tested), so it is pure scheduling and excluded from
    # the update/query fingerprint.  Power of two in [1, 8]; the scheduler
    # clamps it to the SMEM budget per shape (effective_lane_stack).
    lane_stack: int = 1
    max_seq_len: int = 256          # pad/bucket ceiling for segment length
    length_bucketing: bool = True
    use_pallas: bool = True         # anti-diagonal wavefront Pallas kernel
    dtype: str = "float32"


@dataclass
class ClusterConfig:
    """Agglomerative clustering over the DTW distance matrix (SS3 row 7)."""

    linkage: str = "average"        # "single" | "complete" | "average" | "weighted"
    # Exactly one of the two cut criteria applies; threshold wins if both set.
    distance_threshold: float | None = None
    n_clusters: int | None = None
    # Default data-driven cut when neither is set: "gap" cuts at the FIRST
    # relative jump >= auto_cut_min_rel_gap between consecutive merge
    # heights in the dendrogram's upper merge region (scale-aware: tracks
    # the true cluster count from 50 to 2000+ segments, tested vs planted
    # truth; the largest-gap rule was measured to fuse motifs), falling back
    # to the quantile rule when no jump reaches the threshold; "quantile"
    # always uses the quantile rule (round-1 behavior).
    auto_cut: str = "gap"
    # Quantile fallback: swept against planted-motif ground truth: 0.5
    # over-fragments (pairwise F1 0.21), 0.9 keeps purity 1.0 at F1 0.90 on
    # the 100-clip benchmark corpus.
    auto_cut_quantile: float = 0.9
    auto_cut_min_rel_gap: float = 1.25
    min_cluster_size: int = 2       # singleton clusters are noise, dropped
    use_native: bool = True         # C++ NN-chain when available


@dataclass
class OutputConfig:
    """Motif/alignment extraction + artifact writing (SS3 row 8)."""

    write_snippets: bool = True     # per-cluster WAV snippets
    write_alignments: bool = True   # exemplar<->member warping paths
    write_images: bool = True       # per-cluster spectrogram PNGs
    max_images_per_cluster: int = 8
    write_html_report: bool = True  # self-contained index.html
    manifest_name: str = "clusters.json"
    # features.npz: the embedded per-segment feature sequences ([K, L, d]
    # padded + [K] lengths + [K] labels) for downstream analysis outside
    # the framework (plotting, external clustering, classifier training).
    write_features: bool = False
    # labels/<clip>.txt: one Audacity label track per clip (tab-separated
    # "start_s\tend_s\tclusterNNN" rows) — drop onto the recording in any
    # standard audio editor to see the discovered patterns in place.
    write_label_tracks: bool = True


@dataclass
class ParallelConfig:
    """Device-mesh sharding (SS3 rows 9-10; built TPU-first, absent in ref)."""

    # Mesh axes: pairs/batch data-parallel axis + optional model axis for
    # the AE's hidden layers.  (data_axis * model_axis) must divide device count.
    data_axis: int = -1             # -1 = all devices
    model_axis: int = 1
    # Persist completed distance-matrix blocks for resume (SURVEY.md SS6.3).
    checkpoint_blocks: bool = False
    block_dir: str = "dtw_blocks"


@dataclass
class PipelineConfig:
    spectrogram: SpectrogramConfig = field(default_factory=SpectrogramConfig)
    segmentation: SegmentationConfig = field(default_factory=SegmentationConfig)
    autoencoder: AutoencoderConfig = field(default_factory=AutoencoderConfig)
    dtw: DTWConfig = field(default_factory=DTWConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    seed: int = 0

    # ------------------------------------------------------------ validation
    def validate(self) -> "PipelineConfig":
        """Fail fast on malformed knobs with messages naming the field."""
        sp, dt, cl = self.spectrogram, self.dtw, self.cluster

        def check(cond, msg):
            if not cond:
                raise ValueError(f"invalid config: {msg}")

        check(sp.win_length > 0, f"spectrogram.win_length={sp.win_length} must be > 0")
        check(sp.hop_length > 0, f"spectrogram.hop_length={sp.hop_length} must be > 0")
        check(
            sp.hop_length <= sp.win_length,
            f"spectrogram.hop_length={sp.hop_length} > win_length={sp.win_length}",
        )
        check(
            sp.n_fft is None or sp.n_fft >= sp.win_length,
            f"spectrogram.n_fft={sp.n_fft} < win_length={sp.win_length}",
        )
        check(sp.window in ("hann", "hamming", "rect"), f"spectrogram.window={sp.window!r}")
        check(sp.fft_impl in ("matmul", "rfft"), f"spectrogram.fft_impl={sp.fft_impl!r}")
        check(
            sp.fft_precision in ("default", "high", "highest"),
            f"spectrogram.fft_precision={sp.fft_precision!r}",
        )
        check(
            sp.upload_codec in ("auto", "mulaw8"),
            f"spectrogram.upload_codec={sp.upload_codec!r}",
        )
        check(sp.clip_batch > 0, "spectrogram.clip_batch must be > 0")
        check(sp.chunk_frames > 0, "spectrogram.chunk_frames must be > 0")
        check(
            sp.feature in ("bins", "mel", "mfcc"),
            f"spectrogram.feature={sp.feature!r}",
        )
        check(
            sp.resample in ("warn", "auto"),
            f"spectrogram.resample={sp.resample!r}",
        )
        if sp.feature in ("mel", "mfcc"):
            check(sp.n_mels >= 2, f"spectrogram.n_mels={sp.n_mels} must be >= 2")
            check(sp.fmin >= 0.0, f"spectrogram.fmin={sp.fmin} must be >= 0")
            # The filterbank clamps its top edge to the max_bins-capped
            # spectrum; validate against the rate the builder will actually
            # use so a bad range fails HERE, not mid-pipeline at trace time.
            top_hz = (sp.n_bins - 1) * sp.sample_rate / sp.fft_size
            fmax = min(
                sp.fmax if sp.fmax is not None else sp.sample_rate / 2, top_hz
            )
            check(
                sp.fmin < fmax,
                f"spectrogram.fmin={sp.fmin} must be < the effective fmax="
                f"{fmax:.1f} Hz (min of fmax/Nyquist and the max_bins-capped "
                f"top frequency {top_hz:.1f} Hz)",
            )
        if sp.feature == "mfcc":
            check(
                1 <= sp.n_mfcc <= sp.n_mels,
                f"spectrogram.n_mfcc={sp.n_mfcc} must be in [1, n_mels={sp.n_mels}]",
            )
        check(dt.band is None or dt.band >= 0, f"dtw.band={dt.band} must be >= 0 or null")
        check(
            dt.band_mode in ("diag", "widen"),
            f"dtw.band_mode={dt.band_mode!r} must be 'diag' or 'widen'",
        )
        check(cl.auto_cut in ("gap", "quantile"), f"cluster.auto_cut={cl.auto_cut!r}")
        check(
            cl.auto_cut_min_rel_gap > 1.0,
            f"cluster.auto_cut_min_rel_gap={cl.auto_cut_min_rel_gap} must be > 1",
        )
        check(dt.pair_batch > 0, "dtw.pair_batch must be > 0")
        check(
            dt.lane_stack in (1, 2, 4, 8),
            f"dtw.lane_stack={dt.lane_stack} must be a power of two in [1, 8]",
        )
        check(dt.max_seq_len > 0, "dtw.max_seq_len must be > 0")
        check(
            dt.metric in ("euclidean", "sqeuclidean", "cosine"),
            f"dtw.metric={dt.metric!r}",
        )
        check(dt.normalize in ("none", "path_len"), f"dtw.normalize={dt.normalize!r}")
        check(
            cl.linkage in ("single", "complete", "average", "weighted"),
            f"cluster.linkage={cl.linkage!r}",
        )
        check(
            cl.distance_threshold is None or cl.distance_threshold >= 0,
            "cluster.distance_threshold must be >= 0 or null",
        )
        check(
            cl.n_clusters is None or cl.n_clusters >= 1,
            "cluster.n_clusters must be >= 1 or null",
        )
        check(self.autoencoder.latent_dim > 0, "autoencoder.latent_dim must be > 0")
        check(self.autoencoder.epochs >= 0, "autoencoder.epochs must be >= 0")
        check(
            self.autoencoder.method in ("ae", "pca"),
            f"autoencoder.method={self.autoencoder.method!r}",
        )
        check(
            self.autoencoder.context_frames >= 0,
            f"autoencoder.context_frames={self.autoencoder.context_frames} "
            "must be >= 0",
        )
        check(
            0.0 <= self.autoencoder.overlap_clip_fraction < 1.0,
            "autoencoder.overlap_clip_fraction="
            f"{self.autoencoder.overlap_clip_fraction} must be in [0, 1)",
        )
        if self.autoencoder.enabled and self.autoencoder.method == "pca":
            check(
                self.autoencoder.latent_dim <= sp.feature_dim,
                f"autoencoder.latent_dim={self.autoencoder.latent_dim} exceeds "
                f"the feature dimension {sp.feature_dim} (PCA cannot expand)",
            )
        check(
            0.0 <= cl.auto_cut_quantile <= 1.0,
            f"cluster.auto_cut_quantile={cl.auto_cut_quantile} must be in [0, 1]",
        )
        check(cl.min_cluster_size >= 1, "cluster.min_cluster_size must be >= 1")
        sg = self.segmentation
        check(sg.method in ("energy", "sliding"), f"segmentation.method={sg.method!r}")
        check(sg.min_len_frames >= 1, "segmentation.min_len_frames must be >= 1")
        check(
            sg.max_len_frames >= sg.min_len_frames,
            f"segmentation.max_len_frames={sg.max_len_frames} < min_len_frames",
        )
        check(sg.window_frames >= 1, "segmentation.window_frames must be >= 1")
        check(sg.stride_frames >= 1, "segmentation.stride_frames must be >= 1")
        return self

    # ---------------------------------------------------------- serialization
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2))

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "PipelineConfig":
        sections = {
            "spectrogram": SpectrogramConfig,
            "segmentation": SegmentationConfig,
            "autoencoder": AutoencoderConfig,
            "dtw": DTWConfig,
            "cluster": ClusterConfig,
            "output": OutputConfig,
            "parallel": ParallelConfig,
        }
        unknown = set(d) - set(sections) - {"seed"}
        if unknown:
            raise ValueError(
                f"unknown config section(s) {sorted(unknown)}; "
                f"expected {sorted(sections)} or 'seed'"
            )
        kwargs: dict[str, Any] = {}
        for name, tp in sections.items():
            if name in d:
                sub = dict(d[name])
                # tuples arrive as lists from JSON
                for f in dataclasses.fields(tp):
                    if f.name in sub and isinstance(sub[f.name], list):
                        sub[f.name] = tuple(sub[f.name])
                kwargs[name] = tp(**sub)
        if "seed" in d:
            kwargs["seed"] = d["seed"]
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path: str | Path) -> "PipelineConfig":
        return cls.from_dict(json.loads(Path(path).read_text()))

    def override(self, dotted: dict[str, Any]) -> "PipelineConfig":
        """Apply `{"dtw.band": 32, ...}` style overrides; returns new config."""
        d = self.to_dict()
        for key, value in dotted.items():
            parts = key.split(".")
            node = d
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"unknown config key: {key}")
            node[parts[-1]] = value
        return PipelineConfig.from_dict(d)
