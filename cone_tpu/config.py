"""Typed configuration for the whole framework.

Replaces the reference's ~60-flag argparse tree (cone/config.py:21-164) with
nested frozen dataclasses + JSON round-trip. Defaults reproduce the
reference's canonical Ego4D settings (cone/scripts/train_ego4d.sh:19-36);
`mad_config()` gives the MAD settings (cone/scripts/train_mad.sh:20-42).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class ModelConfig:
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 2
    dec_layers: int = 2
    dim_feedforward: int = 1024
    dropout: float = 0.1
    input_dropout: float = 0.5
    num_queries: int = 5
    t_feat_dim: int = 256          # EgoVLP text dim; 512 CLIP / 768 RoBERTa
    v_motion_feat_dim: int = 256   # Moment-DETR branch video dim
    v_appear_feat_dim: int = 256   # matching/adapter branch video dim
    n_input_proj: int = 2
    model_family: str = "cone"     # "cone" (Moment-DETR head) | "tan" (2D-TAN)
    use_txt_pos: bool = False
    pre_norm: bool = False
    adapter_module: str = "linear"  # "linear" | "none"
    span_loss_type: str = "l1"
    max_q_l: int = 20
    max_v_l: int = 90
    # Compute dtype for the transformer ("float32" | "bfloat16"); params are
    # always float32.
    compute_dtype: str = "float32"
    # Pad the encoder sequence (vid + txt) to a multiple of this — sublane
    # alignment. Masked padding changes nothing numerically; measured +20%
    # on the attention core at ego4d L=110 -> 112, net-negative at MAD
    # L=145 -> 160 (docs/RESULTS.md round 3). 1 = off.
    seq_pad_multiple: int = 1


@dataclass(frozen=True)
class TanConfig:
    """CONE-TAN (2D-TAN head) hyperparameters; defaults follow the reference
    experiment yaml (cone_2dtan/experiments/ego4d/*.yaml)."""

    num_clips: int = 64          # map size after frame pooling (= NUM_SAMPLE_CLIPS / TARGET_STRIDE)
    hidden_size: int = 256
    v_feat_dim: int = 256
    t_feat_dim: int = 768
    txt_hidden_size: int = 256
    lstm_layers: int = 3
    num_scale_layers: tuple = (16, 8, 8)
    map_hidden_sizes: tuple = (256, 256, 256, 256)
    map_kernel_sizes: tuple = (9, 9, 9, 9)
    map_paddings: tuple = (16, 0, 0, 0)
    # frame pooling = the reference's TARGET_STRIDE: the raw window is
    # num_clips * frame_stride clips (DATASET.NUM_SAMPLE_CLIPS) and must
    # equal data.max_v_l. Ego4D yaml: stride 1 (64 -> 64); MAD yaml:
    # kernel=stride=2 (128 -> 64x64 map).
    frame_kernel: int = 1
    frame_stride: int = 1
    frame_module: str = "avg"        # "avg" | "max" (FrameAvgPool/FrameMaxPool)
    prop_module: str = "sparse_pool" # "sparse_pool" | "sparse_conv" | "dense_pool"
    dense_num_layers: int = 16       # PropMaxPool NUM_LAYERS
    adapter_module: str = "linear"
    min_iou: float = 0.3
    max_iou: float = 0.7
    bias: float = 0.5
    temperature: float = 0.07
    proposal_top_k: int = 10     # TEST.PROPOSAL_TOP_K


@dataclass(frozen=True)
class LossConfig:
    span_loss_coef: float = 10.0
    giou_loss_coef: float = 1.0
    label_loss_coef: float = 4.0
    adapter_loss_coef: float = 1.0
    lw_saliency: float = 1.0
    eos_coef: float = 0.1
    temperature: float = 0.07
    saliency_margin: float = 0.2
    set_cost_span: float = 10.0
    set_cost_giou: float = 1.0
    set_cost_class: float = 4.0
    aux_loss: bool = True
    neg_loss: bool = True
    adapter_loss: bool = True


@dataclass(frozen=True)
class DataConfig:
    dset_name: str = "ego4d"      # "ego4d" | "mad" | "synthetic"
    train_path: Optional[str] = None
    eval_path: Optional[str] = None
    eval_split_name: str = "val"
    motion_feat_dir: Optional[str] = None
    appearance_feat_dir: Optional[str] = None
    t_feat_dir: Optional[str] = None
    max_q_l: int = 20
    max_v_l: int = 90
    clip_length: float = 0.535    # seconds per clip feature (ego4d EgoVLP)
    max_windows: int = 5
    topk_window: int = 20
    data_ratio: float = 1.0        # downsample every split (config.py:33-36)
    # downsample the TRAIN split only (dev convenience, config.py:29-32);
    # applied on top of data_ratio by the train driver
    train_data_ratio: float = 1.0
    normalize_v: bool = True
    normalize_t: bool = True
    txt_drop_ratio: float = 0.0
    # host RAM bound: keep at most this many videos' normalized features
    # cached (FIFO). 0 = unbounded (the reference RAM-caches everything,
    # ego4d_mad_dataloader.py:97-111 — tens of GB at MAD scale); re-reads
    # are one mmap slice + L2 normalize
    max_cached_videos: int = 0
    # static padded length for whole-video feature arrays (coarse stage)
    max_ctx_l: int = 2304


@dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    coef_lr: float = 0.1          # adapter lr multiplier
    wd: float = 1e-4
    lr_drop: int = 120            # epochs between x0.1 lr drops
    # TAN family only: ReduceLROnPlateau on the eval stop score
    # (cone_2dtan/moment_localization/train.py:143-147, config.py:75-76)
    plateau_factor: float = 0.8
    plateau_patience: int = 20
    n_epoch: int = 150
    bsz: int = 32
    grad_clip: float = 0.1
    seed: int = 2018
    eval_epoch_interval: int = 3
    max_es_cnt: int = 10
    start_epoch_for_adapter: int = 30
    results_dir: str = "results"
    exp_id: str = "exp"
    save_interval: int = 50
    dp_devices: int = 1           # data-parallel mesh size
    # tensor-parallel mesh size: >1 builds a (dp, tp) mesh and Megatron-
    # shards the transformer matmul params over the inner "tp" axis
    # (parallel/mesh.param_shardings). Single-process only (tp all-reduces
    # belong on ICI); evals flatten back to full-device DP. At CONE scale
    # this is a framework capability, not a capacity need — see
    # parallel/mesh.py module docstring.
    tp_devices: int = 1
    # ECCV'22 leaderboard recipe: per example, 3 extra variable-length
    # windows (0.4-2x stride, GT-covering) join the batch as additional
    # Moment-DETR rows (data/multiscale.py MultiscaleTrainLoader,
    # cone/ego4d_dataloader_for_eccv2022_workshop.py:179-235). Single-host
    # only (the [std; extra] batch layout can't row-slice per process).
    multiscale: bool = False
    # smoke mode: cap each train epoch at 3 batches and evals at one query
    # chunk (the reference's --debug break-all-loops flag, cone/config.py:27-28,
    # train.py:101-102)
    debug: bool = False
    # PRNG implementation for the training rng stream (dropout masks).
    # "threefry" = jax default, counter-based, bit-stable across versions;
    # "rbg" = XLA RngBitGenerator. Honest rejection: rbg won a
    # forward-only microbench (1.10 ms deterministic vs 2.93 ms threefry
    # dropout vs 1.62 ms rbg at bsz 128) but the full bf16 train step is
    # 3.7x SLOWER with rbg (16.7 -> 64.0 ms/step, tools/bench_rng.py,
    # two sessions) — the RngBitGenerator HLO blocks fusion in the
    # fwd+bwd program. All presets keep threefry; the knob stays for
    # experimentation (masks differ between impls but both are valid
    # dropout). docs/RESULTS.md round 4.
    rng_impl: str = "threefry"


@dataclass(frozen=True)
class EvalConfig:
    nms_thd: float = 0.5
    max_before_nms: int = 200
    max_after_nms: int = 5
    # "both" | "proposal" | "matching" | "clip" ("clip" = the reference's own
    # name for the matching modality, cone/inference.py:489)
    eval_modality: str = "both"
    no_sort_results: bool = False
    # compute the criterion's loss terms on the eval split at every
    # train-time eval (deterministic positive/negative windows, dropout
    # off) and log them next to the recall tables — the eval-loss curves
    # the reference's eval_epoch wires up for TensorBoard
    # (cone/inference.py:30-36, 96-98)
    criterion_losses: bool = True
    # chunk of queries per device batch in the fine stage. Like
    # video_batch, SMALLER dispatches run faster device-side (XLA
    # optimizes the smaller program better: ego4d device q/s 5098/4759/
    # 3727 at qc 8/16/32; MAD 1013/956/887 — docs/RESULTS.md r3) while
    # wall-clock over a high-latency tunnel prefers larger ones (fewer
    # round trips: ego4d wall 725/1146/1828). Default 32 = tunnel
    # wall-optimal; co-located hosts should run 8-16 and gain ~25%.
    query_chunk: int = 32
    # context-length buckets: each video pads to the smallest bucket that
    # fits (falling back to data.max_ctx_l) instead of always max_ctx_l.
    # One compiled program per bucket; cuts the coarse-stage compute/HBM
    # tax at MAD scale. Empty = single max_ctx_l shape.
    ctx_buckets: tuple = ()
    # fused path: number of (video, query-chunk) work items batched into ONE
    # device dispatch (vmapped). Default 1 — measured fastest device-side
    # (3023 q/s vb=1 vs 2369 vb=8 at ego4d scale: XLA optimizes the
    # unbatched program better, and the batched result fetch already
    # pipelines dispatch round trips). Raise only on high-latency links
    # where per-dispatch overhead dominates (docs/SERVING.md).
    video_batch: int = 1
    # coarse stage via the fused Pallas kernel (ops/pallas_coarse.py) instead
    # of the XLA matmul+reduce. Measured on v5e the XLA path is at least as
    # fast (tools/bench_coarse.py), so this defaults off; the kernel exists
    # for topologies where the (Q, L) intermediate becomes the bottleneck.
    use_pallas_coarse: bool = False
    # training-loop evals through the fused device path instead of the
    # reference-exact host postproc. Device dedup + max_before_nms match
    # the host on every tested geometry incl. the 300-candidate TAN-MAD
    # one (tests/test_nms_device_parity.py); the one known residual is the
    # 4-dp rounding decision within ~6e-4 of an exact .5 boundary
    # (ops/spans.py round4_device). Safe for the stop score; this is the
    # knob that keeps MAD-scale eval epochs off the host Python.
    # Defaults off: host postproc stays the reference-parity baseline.
    fused_train_eval: bool = False
    # dtype of the HBM-resident video-feature corpus: "float32" (exact),
    # "bfloat16" (2x residency) or "int8" (4x residency, symmetric per-frame
    # scales). Decoding back to fp32 happens inside the compiled program, so
    # all compute keeps the model's compute_dtype; only what sits in HBM
    # between requests shrinks. At MAD scale a 2 h movie is ~134 MB fp32 and
    # ~34 MB int8 — the knob that sets how many movies one chip can serve.
    corpus_dtype: str = "float32"


@dataclass(frozen=True)
class ConeConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    tan: TanConfig = field(default_factory=TanConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str, strict: bool = False) -> "ConeConfig":
        """Parse a config JSON.

        strict=False (default) drops unknown keys with a warning — required
        so workdir opt.json snapshots round-trip across cone_tpu versions in
        both directions. strict=True raises on unknown keys instead; the CLI
        uses it for user-supplied --config files so a typo ('n_epochs' for
        'n_epoch') fails loudly rather than silently using the default."""
        raw = json.loads(s)
        eval_raw = raw.get("eval", {})
        if "ctx_buckets" in eval_raw:
            eval_raw["ctx_buckets"] = tuple(eval_raw["ctx_buckets"])
        tan_raw = raw.get("tan", {})
        for k in ("num_scale_layers", "map_hidden_sizes", "map_kernel_sizes",
                  "map_paddings"):
            if k in tan_raw:
                tan_raw[k] = tuple(tan_raw[k])

        def build(section_cls, section_raw, name):
            # keys this build doesn't know (renamed/removed fields, or a
            # workdir written by a NEWER build) are dropped with a warning
            # instead of failing the load — saved opt.json snapshots must
            # round-trip across versions in both directions
            known = {f.name for f in dataclasses.fields(section_cls)}
            unknown = sorted(set(section_raw) - known)
            if unknown:
                if strict:
                    raise ValueError(
                        f"config section '{name}': unknown keys {unknown}")
                import warnings

                warnings.warn(
                    f"config section '{name}': ignoring unknown keys "
                    f"{unknown} (written by a different cone_tpu version)")
            return section_cls(
                **{k: v for k, v in section_raw.items() if k in known})

        return cls(
            model=build(ModelConfig, raw.get("model", {}), "model"),
            loss=build(LossConfig, raw.get("loss", {}), "loss"),
            data=build(DataConfig, raw.get("data", {}), "data"),
            train=build(TrainConfig, raw.get("train", {}), "train"),
            eval=build(EvalConfig, raw.get("eval", {}), "eval"),
            tan=build(TanConfig, tan_raw, "tan"),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str, strict: bool = False) -> "ConeConfig":
        with open(path) as f:
            return cls.from_json(f.read(), strict=strict)

    def replace(self, **sections) -> "ConeConfig":
        return dataclasses.replace(self, **sections)


def ego4d_config() -> ConeConfig:
    """Canonical Ego4D-NLQ EgoVLP config (cone/scripts/train_ego4d.sh:19-36)."""
    return ConeConfig(
        # seq_pad_multiple: window 90 + query 20 = 110 pads to 112 (bf16
        # sublane multiple) — the attention core runs ~20% faster with
        # bit-identical valid outputs (docs/RESULTS.md round 3)
        model=ModelConfig(seq_pad_multiple=16),
        data=DataConfig(
            dset_name="ego4d", max_v_l=90, clip_length=0.535, topk_window=20,
            max_ctx_l=2304,
        ),
        train=TrainConfig(n_epoch=150, lr_drop=120, bsz=32, start_epoch_for_adapter=30),
    )


def ego4d_scratch_config() -> ConeConfig:
    """Ego4D preset tuned for FROM-SCRATCH training on TPU: identical to
    ego4d_config() except nheads=2 (d_head 128 — one MXU lane; same
    parameter count). At the recommended co-located serving dispatch
    (eval.query_chunk=16, SERVING.md) the one-process ordering is
    nheads=2+pad 4 988 > nheads=8+pad 4 720 > nheads=4 unpadded 4 258
    q/s device (docs/RESULTS.md round 3). Converted reference checkpoints
    need nheads=8, so the plain preset keeps the reference geometry and
    this one encodes the faster choice for new models.

    compute_dtype=bfloat16: from-scratch training defaults to the native
    MXU dtype — measured 7.3x faster steps on v5e (42.6 -> 5.8 ms,
    tools/bench_train.py) with closely tracking losses (docs/RESULTS.md);
    fp32 matmuls emulate via multi-pass bf16 on this chip. The plain
    presets stay fp32 for converted-checkpoint parity.

    train.bsz stays at the reference's 32 DELIBERATELY: bsz 128 is +50%
    samples/s on v5e, but the round-5 loss-tracking A/B
    (tools/bench_train_recipe_ab.py, docs/RESULTS.md) shows neither
    linear nor sqrt lr scaling makes it track the bsz-32 eval-loss
    trajectory at a fixed sample budget. Set train.bsz=128 only when
    wall-clock per epoch, not loss per sample, is the constraint."""
    cfg = ego4d_config()
    return cfg.replace(model=dataclasses.replace(
        cfg.model, nheads=2, seq_pad_multiple=16,
        compute_dtype="bfloat16"))


def mad_scratch_config() -> ConeConfig:
    """MAD preset for FROM-SCRATCH training: mad_config() with nheads=2
    (d_head 128 — exactly one MXU lane width; identical parameter count).
    Measured in one process on v5e at full MAD serving scale: nheads
    8 -> 4 -> 2 gives 921 -> 1008 -> 1084 q/s device (+18% total — see
    docs/RESULTS.md round 3; ego4d_scratch_config likewise encodes
    nheads=2 after the qc=16 serving sweep). Converted reference
    checkpoints need nheads=8, so the plain preset keeps the reference
    geometry."""
    cfg = mad_config()
    # seq_pad_multiple=16: at d_head=128 the sublane-aligned sequence
    # (145 -> 160) is a further +23% on the fine forward (15.04 ->
    # 12.20 ms, tools/bench_seqpad.py) — unlike the nheads=8 reference
    # geometry where it is a wash (so mad_config keeps 1).
    # compute_dtype=bfloat16: same rationale as ego4d_scratch_config —
    # scratch training runs at the MXU's native dtype (7.3x, RESULTS.md)
    return cfg.replace(model=dataclasses.replace(
        cfg.model, nheads=2, seq_pad_multiple=16,
        compute_dtype="bfloat16"))


def tan_ego4d_config() -> ConeConfig:
    """Canonical 2D-TAN Ego4D config (cone_2dtan/experiments/ego4d/
    2D-TAN-64x64-K9L4-pool-sw-0.5bias-nms-con-match-adapt.yaml): window 64
    @0.535 s EgoVLP features, stride-1 frame pooling -> 64x64 map."""
    return ConeConfig(
        # ModelConfig dims mirror the tan section: the shared pipeline
        # buffers (eval/pipeline.py _chunk_queries) size token arrays by
        # model.t_feat_dim and cls arrays by model.v_appear_feat_dim
        model=ModelConfig(model_family="tan", t_feat_dim=768,
                          v_motion_feat_dim=256, v_appear_feat_dim=256),
        # ADAPTER_LOSS_WEIGHT 0.1 (lib/core/config.py:83)
        loss=LossConfig(adapter_loss_coef=0.1),
        data=DataConfig(
            dset_name="ego4d", max_v_l=64, clip_length=0.535, topk_window=20,
            max_ctx_l=2304,
        ),
        # MAX_EPOCH 90 + adapter from epoch 28 (the yaml's
        # ADAPTER_START_EPOCH 27 via strict >, lib/core/config.py:84) — an
        # 8-epoch run would never activate the adapter NCE yet still apply
        # the random-init adapter in the coarse stage at eval
        train=TrainConfig(n_epoch=90, bsz=32, lr=1e-4, wd=0.0,
                          start_epoch_for_adapter=28),
        tan=TanConfig(num_clips=64, v_feat_dim=256, t_feat_dim=768,
                      frame_kernel=1, frame_stride=1),
    )


def tan_mad_config() -> ConeConfig:
    """Canonical 2D-TAN MAD config (cone_2dtan/experiments/mad/
    2D-TAN-64x64-K9L4-pool-sw-0.5bias-nms-con-match.yaml): window
    NUM_SAMPLE_CLIPS=128 @0.2 s CLIP features, TARGET_STRIDE=2 frame
    avg-pooling -> 64x64 map."""
    return ConeConfig(
        # adapter off end-to-end: MODEL.ADAPTER defaults to '' and the yaml
        # sets ADAPTER_LOSS: False (coarse stage then ranks raw features);
        # dims mirror the tan section (512-d CLIP video + text at MAD)
        model=ModelConfig(model_family="tan", adapter_module="none",
                          t_feat_dim=512, v_motion_feat_dim=512,
                          v_appear_feat_dim=512),
        loss=LossConfig(adapter_loss=False),
        data=DataConfig(
            dset_name="mad", max_v_l=128, clip_length=0.2, topk_window=30,
            max_ctx_l=65536,
        ),
        train=TrainConfig(n_epoch=8, bsz=32, lr=1e-4, wd=0.0),
        tan=TanConfig(num_clips=64, v_feat_dim=512, t_feat_dim=512,
                      txt_hidden_size=256, frame_kernel=2, frame_stride=2,
                      adapter_module="none"),  # MODEL.ADAPTER defaults ''
    )


def mad_config() -> ConeConfig:
    """Canonical MAD CLIP config (cone/scripts/train_mad.sh:20-42)."""
    return ConeConfig(
        model=ModelConfig(t_feat_dim=512, v_motion_feat_dim=512, v_appear_feat_dim=512),
        loss=LossConfig(adapter_loss_coef=0.2),
        data=DataConfig(
            dset_name="mad", max_v_l=125, clip_length=0.2, topk_window=30,
            max_ctx_l=65536,
        ),
        train=TrainConfig(n_epoch=30, lr_drop=25, bsz=32, seed=2020),
        # bucketed padding: a standard 2 h @ 5 fps movie (~36k clips) pads to
        # 36864 instead of 65536 — ~1.8x less coarse-stage compute/HBM.
        # fused_train_eval: at MAD scale a training-loop eval pushes 300
        # candidates/query through host Python; the fused device path
        # matches host postproc on every tested geometry incl. TAN-MAD
        # (tests/test_nms_device_parity.py, test_train_loop.py
        # fused==host) — the one known residual is the 4-dp rounding
        # decision within ~6e-4 of an exact .5 boundary (fp32 on device vs
        # decimal on host; eval/pipeline.py r4) — so the preset keeps eval
        # epochs on the chip.
        eval=EvalConfig(ctx_buckets=(8192, 16384, 24576, 36864, 49152),
                        fused_train_eval=True),
    )
