"""Single-tree configuration system.

Mirrors the reference Hydra tree (reference: configs/config.yaml:1-97) as nested
dataclasses with YAML loading and dotted-path CLI overrides, without a Hydra
dependency.  Every field of the reference config has an equivalent here; extra
TPU-specific knobs live under ``mesh`` and ``precision``.

Deliberately omitted reference keys (verified complete otherwise):
``device``/``corrs_device`` (GPU-vs-CPU placement — meaningless under XLA:
everything runs on the TPU device) and the runtime-mutable ``tmp.*`` output
paths (reference config.yaml:94-97 — replaced by the pure functions in
checkpoint.py: results_dir/logs_dir/ckpt_dir).
"""
from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import yaml


class _Yaml12Loader(yaml.SafeLoader):
    """SafeLoader with YAML-1.2 bool semantics: only true/false parse as
    booleans; yes/no/on/off stay literal strings.  This keeps string-valued
    keys (test.add_description: yes) intact in BOTH config files and CLI
    overrides; bool-valued keys still accept yes/on via _apply's coercion."""


_Yaml12Loader.yaml_implicit_resolvers = {
    ch: [(tag, rx) for tag, rx in resolvers
         if tag != "tag:yaml.org,2002:bool"]
    for ch, resolvers in yaml.SafeLoader.yaml_implicit_resolvers.items()
}
_Yaml12Loader.add_implicit_resolver(
    "tag:yaml.org,2002:bool",
    re.compile(r"^(?:true|True|TRUE|false|False|FALSE)$"),
    list("tTfF"))


@dataclass
class TrainSplitConfig:
    name: str = "shapenet6d"
    split: str = "custom_train"
    obj: str = "all"


@dataclass
class TestSplitConfig:
    name: str = "nocs"
    split: str = "cross_scene_test"
    obj: str = "all"


@dataclass
class DatasetConfig:
    root: str = "data"
    batch_size: int = 32
    img_size: Tuple[int, int] = (224, 224)
    max_corrs: int = 500
    # in-RAM decoded-item cache (GiB; 0 disables). Exact numerics — hides
    # per-item image decode from the 1-worker host critical path the way
    # the reference hides it behind 8 DataLoader workers (pipeline.py:507).
    cache_gib: float = 16.0
    train: TrainSplitConfig = field(default_factory=TrainSplitConfig)
    test: TestSplitConfig = field(default_factory=TestSplitConfig)


@dataclass
class ImageEncoderConfig:
    # reference: configs/config.yaml:31-39
    img_size: Tuple[int, int] = (192, 192)
    out_channels: int = 32
    extra_upsampling: bool = True
    vlm: str = "clip"
    use_decoder_guidance: bool = True
    use_cost_guidance: bool = True
    decoder_type: str = "standard"


@dataclass
class ModelConfig:
    use_catseg_ckpt: bool = True
    size: str = "full"  # full | small | tiny (small/tiny for smoke tests)
    # Inference quantization. "int8": CLIP tower projections on the int8 MXU
    # path (models/quant.py), e2e +16% measured. Default since the trained-
    # checkpoint A/B (BASELINE.md round 3): AR/ADD(S) deltas within noise
    # (0.7286 vs 0.7310 AR on the hardened val split). "none" = strict-parity
    # bf16. Applies to run_test/serving; training uses train_quant.
    # Smoke-test sizes (small/tiny) have no CLIP tower -> quant is ignored
    # for them (models/oryon.py resolve_quant).
    quant: str = "int8"
    # oryon_tpu extension (the reference always freezes the towers): train
    # the CLIP-vision + Swin towers jointly with fusion/decoder.  The
    # in-sandbox control for the AR ceiling — pretrained tower weights are
    # un-downloadable here, so the frozen towers are random; this tests
    # whether the residual headroom is tower-bound (models/oryon.py
    # OryonModel.train_towers).  Text tower stays frozen (prompt cache).
    train_towers: bool = False
    # CLIP vision-tower attention implementation (models/clip.py
    # MultiHeadAttention): "fused" = lane-packed Pallas MHA (default);
    # "fused_i8qk" additionally computes the attention logits on the int8
    # MXU (opt-in pending a trained-weight accuracy A/B, like quant was);
    # einsum/flash/auto are the fallback paths. Ignored for small/tiny
    # (models/oryon.py resolve_attn_impl), which need per-sample masking.
    attn_impl: str = "fused"
    # Training-time quantization (run_train.py). Kept at bf16 strict parity:
    # the frozen-tower feature contract the fusion/decoder learn against
    # matches the reference (reference models/vlm.py:14-106).
    train_quant: str = "none"
    image_encoder: ImageEncoderConfig = field(default_factory=ImageEncoderConfig)


@dataclass
class LossWeights:
    mask: float = 1.0
    pos: float = 0.5
    neg: float = 0.5


@dataclass
class LossConfig:
    # reference: configs/config.yaml:41-50
    hard_negatives: bool = True
    pos_margin: float = 0.2
    neg_margin: float = 0.9
    neg_kernel_size: int = 5
    mask_type: str = "dice"
    neg_pool: int = 2000  # hardest-negative candidate pool (reference losses.py:196)
    w: LossWeights = field(default_factory=LossWeights)


@dataclass
class TestConfig:
    # reference: configs/config.yaml:52-62
    mask: str = "predicted"  # predicted | oracle | ovseg
    add_description: str = "yes"
    src_sampling: int = 5000
    solver: str = "pointdsc"  # pointdsc | ransac
    n_corrs: int = 500
    dist_th: float = 0.25
    mask_threshold: float = 0.5
    only_save_masks: bool = False
    only_save_featmaps: bool = False
    # oryon_tpu extension — dense trimmed-ICP refinement of the solver pose
    # on the masked depth clouds (pipeline.PipelineConfig icp_*;
    # geometry/kabsch.py masked_icp).  ON by default since round 5: the
    # measured-best knobs below lift 240-pair AR 0.8811 -> 0.9486 and cut
    # R err 6.2 -> 3.8 deg (decisive paired bootstrap, BASELINE.md round-5).
    # The reference defines but never calls its ICP (utils/geo6d.py:157);
    # set icp_refine=false for strict reference-protocol parity.
    icp_refine: bool = True
    icp_points: int = 1024
    icp_iters: int = 48
    icp_trim: float = 0.6


@dataclass
class OptimizationConfig:
    # reference: configs/config.yaml:64-70
    optim_type: str = "Adam"
    scheduler_type: str = "cosine"
    lr: float = 1e-3
    momentum: float = 0.0
    w_decay: float = 5e-4
    gamma: float = 0.1


@dataclass
class TrainingConfig:
    n_epochs: int = 20
    freq_save: int = 5
    freq_valid: int = 5
    # gradient accumulation: split each batch into this many micro-batches
    # inside the jitted step (train.train_step) — activation memory scales
    # with B/accum_steps while the optimizer still sees the full-batch mean
    # gradient.  Needed for model.train_towers at effective B=32 on one
    # v5e chip (the unfrozen backward OOMs otherwise; BASELINE.md round 4).
    accum_steps: int = 1
    # host-RSS watchdog: the TPU relay backend leaks ~1 byte of host memory
    # per H2D byte transferred (measured — BASELINE.md round 2), so any
    # multi-hour run eventually OOMs the host.  When RSS crosses this bound
    # at an epoch boundary, run_train checkpoints and re-execs itself with
    # resume_ckpt=last (a few minutes of cache rewarm; no training state
    # lost).  <= 0 disables.
    rss_restart_gib: float = 64.0


@dataclass
class RGBAugConfig:
    jitter: bool = True
    bright: bool = True
    hflip: bool = True
    vflip: bool = True
    # run color/flip augs ON DEVICE inside the jitted train step (the
    # 1-core host data path is the measured training bottleneck; see
    # data/device_augment.py). Host-side stack kept for augs.rgb.device=false.
    device: bool = True


@dataclass
class TextAugConfig:
    synset: bool = True


@dataclass
class AugConfig:
    rgb: RGBAugConfig = field(default_factory=RGBAugConfig)
    text: TextAugConfig = field(default_factory=TextAugConfig)


@dataclass
class PretrainedConfig:
    pointdsc: str = "pretrained_models/pointdsc"
    vocabulary: str = "pretrained_models/bpe_simple_vocab_16e6.txt.gz"
    clip: str = "pretrained_models/clip_vit_l14_336.npz"
    swin: str = "pretrained_models/swin_b.npz"
    catseg: str = "pretrained_models/catseg.npz"


@dataclass
class EvalConfig:
    ckpt: Optional[str] = None
    results: Optional[str] = None
    # VSD depth renders happen in a square window around the object's
    # combined projected bbox (exact; eval/renderer.py). Must cover the
    # largest GT projection — a too-small window raises at the first
    # batch with the required size. 256 px is ample for REAL275/TOYL
    # object scales at their scene depths; cost scales with window area.
    vsd_window: int = 256


@dataclass
class MeshConfig:
    """TPU device-mesh layout (no reference equivalent: reference uses
    single-node Lightning DDP, run_train.py:60-76)."""

    data: int = -1  # -1 = all devices on the data axis
    model: int = 1  # optional tensor-parallel axis for the ViT encoder


@dataclass
class PrecisionConfig:
    compute_dtype: str = "bfloat16"  # activations in the frozen/compute path
    param_dtype: str = "float32"
    matching_dtype: str = "float32"  # NN-matching similarity accumulation


@dataclass
class Config:
    exp_name: str = "baseline"
    exp_root: str = "exp_data"
    exp_tag: str = "Ours"
    use_seed: bool = False
    seed: int = 1
    compute_vsd: bool = True
    viz_valid: bool = False
    debug_valid: bool = False
    profiler: bool = False
    resume_ckpt: str = "none"
    # Warm-start params (only) from another experiment's checkpoint:
    # '<exp_name>', '<exp_name>:<epoch|last>', or a direct path to an
    # 'epoch=NNNN' dir.  Optimizer state and step stay fresh — the fine-tune
    # entry point (e.g. unfreezing towers via model.train_towers needs a
    # different optax partition than the source run, so resume_ckpt cannot
    # restore across that boundary).  oryon_tpu extension; the reference's
    # Lightning resume is whole-state only (run_train.py:29-43).
    init_params_from: str = "none"

    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    test: TestConfig = field(default_factory=TestConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    augs: AugConfig = field(default_factory=AugConfig)
    pretrained: PretrainedConfig = field(default_factory=PretrainedConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    precision: PrecisionConfig = field(default_factory=PrecisionConfig)


def _apply(obj: Any, key: str, value: Any) -> None:
    parts = key.split(".")
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"Unknown config key: {key}")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"Unknown config key: {key}")
    cur = getattr(obj, leaf)
    if isinstance(cur, tuple) and isinstance(value, (list, tuple)):
        value = tuple(value)
    elif isinstance(cur, bool) and isinstance(value, str):
        value = value.lower() in ("1", "true", "yes", "on")
    elif cur is not None and not isinstance(cur, (dict, list, tuple)) and not dataclasses.is_dataclass(cur):
        value = type(cur)(value)
    setattr(obj, leaf, value)


def _merge_dict(obj: Any, d: Dict[str, Any], prefix: str = "") -> None:
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict) and dataclasses.is_dataclass(getattr(obj, k, None)):
            _merge_dict(getattr(obj, k), v)
        else:
            _apply(obj, key, v)


def load_config(path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Config:
    """Build a Config from an optional YAML file plus ``a.b.c=value`` overrides."""
    cfg = Config()
    if path is not None:
        with open(path) as f:
            data = yaml.load(f, Loader=_Yaml12Loader) or {}
        _merge_dict(cfg, data)
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        try:
            value = yaml.load(raw, Loader=_Yaml12Loader)
        except yaml.YAMLError:
            value = raw
        _apply(cfg, key.strip(), value)
    return cfg


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def flatten(cfg: Any, prefix: str = "") -> Dict[str, Any]:
    """Flatten the config tree to dotted keys (reference: utils/misc.py:124-143)."""
    out: Dict[str, Any] = {}
    for f_ in dataclasses.fields(cfg):
        v = getattr(cfg, f_.name)
        key = f"{prefix}{f_.name}"
        if dataclasses.is_dataclass(v):
            out.update(flatten(v, key + "."))
        else:
            out[key] = v
    return out
