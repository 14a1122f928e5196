"""Immutable configuration dataclasses.

Replaces the reference's mutable module-global config (`DG-SCT/AVE/nets/esc_config.py`,
mutated at model init in `DG-SCT/AVE/nets/net_trans.py:696-725`) and the per-task argparse
sprawl (`DG-SCT/AVE/base_options.py:19-218`) with frozen dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AudioFrontendConfig:
    """Wave -> log-mel "image" frontend.

    Reference: torchlibrosa extractors built at `DG-SCT/AVE/nets/htsat.py:443-453`
    with hyperparameters from `nets/esc_config.py:48-54`.
    """
    sample_rate: int = 32000
    clip_seconds: int = 10
    n_fft: int = 1024
    hop_size: int = 320
    mel_bins: int = 64
    fmin: float = 50.0
    fmax: float = 14000.0
    amin: float = 1e-10
    # SpecAugment (htsat.py:451-452)
    time_drop_width: int = 64
    time_stripes_num: int = 2
    freq_drop_width: int = 8
    freq_stripes_num: int = 2
    # reshape_wav2img (htsat.py:719-734)
    spec_size: int = 256
    # STFT GEMM compute dtype: None = f32 (exact, parity-tested vs
    # torchlibrosa); jnp.bfloat16 = MXU fast path for serving (drift bounded
    # by tests/test_dsp.py::test_power_spectrogram_bf16_drift)
    stft_compute: Any = None

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.mel_bins

    @property
    def clip_samples(self) -> int:
        return self.sample_rate * self.clip_seconds

    @property
    def num_frames(self) -> int:
        # center=True STFT frame count
        return self.clip_samples // self.hop_size + 1

    @property
    def target_t(self) -> int:
        return self.spec_size * self.freq_ratio


@dataclasses.dataclass(frozen=True)
class SwinStageConfig:
    depth: int
    num_heads: int


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    """HTS-AT audio Swin tower. Reference: `DG-SCT/AVE/nets/htsat.py:370-826` +
    `nets/esc_config.py:63-69` (spec 256, patch 4/(4,4), dim 96, depths [2,2,6,2],
    heads [4,8,16,32], window 8)."""
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: tuple = (4, 4)
    in_chans: int = 1
    embed_dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.1
    num_classes: int = 527
    ape: bool = False
    patch_norm: bool = True
    frontend: AudioFrontendConfig = dataclasses.field(default_factory=AudioFrontendConfig)

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> tuple:
        r = self.spec_size // self.patch_stride[0]
        return (r, r)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)

    def stage_resolution(self, i: int) -> tuple:
        r = self.patches_resolution
        return (r[0] // (2 ** i), r[1] // (2 ** i))


@dataclasses.dataclass(frozen=True)
class SwinV2Config:
    """Swin-V2-Large visual tower matching timm 0.6.12
    `swinv2_large_window12_192_22k` (created at `DG-SCT/AVE/nets/net_trans.py:693`):
    192x192 input, patch 4, window 12, dims 192->1536, depths [2,2,18,2],
    heads [6,12,24,48], post-norm residuals, scaled-cosine attention, log-CPB bias."""
    img_size: int = 192
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 192
    depths: tuple = (2, 2, 18, 2)
    num_heads: tuple = (6, 12, 24, 48)
    window_size: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    pretrained_window_sizes: tuple = (0, 0, 0, 0)

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> tuple:
        r = self.img_size // self.patch_size
        return (r, r)

    def stage_dim(self, i: int) -> int:
        return int(self.embed_dim * 2 ** i)

    def stage_resolution(self, i: int) -> tuple:
        r = self.patches_resolution
        return (r[0] // (2 ** i), r[1] // (2 ** i))


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """DG-SCT `VisualAdapter` options. Reference: `DG-SCT/AVE/nets/net_trans.py:433-674`
    and flag defaults in `DG-SCT/AVE/base_options.py` / `train.sh` (Adapter_downsample 8,
    num_tokens 32, num_conv_group 2, is_bn/is_gate/is_before_layernorm/is_post_layernorm on)."""
    reduction_factor: int = 8
    num_tokens: int = 32
    num_conv_group: int = 2
    use_bn: bool = True
    use_gate: bool = True
    is_before_layernorm: bool = True
    is_post_layernorm: bool = True
    is_multimodal: bool = True
    alpha: float = 0.3   # channel-att blend (net_trans.py:611)
    beta: float = 0.05   # spatial-att blend
    # AVS's VisualAdapter copy diverges from AVE's in the live multimodal
    # path (avs_s4/model/PVT_AVSModel.py:160-170, 196-300): stage 1 aligns
    # channels with `fc` FIRST then bicubic-resamples tokens on the sqrt grid
    # (conv_adapter is dead weight there), and `ln_before` is NOT applied
    # before the bottleneck. Proven by tests/test_reference_golden.py.
    avs_variant: bool = False


@dataclasses.dataclass(frozen=True)
class AVEModelConfig:
    """Full AVE flagship model (MMIL_Net equivalent, `net_trans.py:677-937`)."""
    swin: SwinV2Config = dataclasses.field(default_factory=SwinV2Config)
    htsat: HTSATConfig = dataclasses.field(default_factory=HTSATConfig)
    adapter: AdapterConfig = dataclasses.field(default_factory=AdapterConfig)
    num_frames: int = 10       # 10 x 1s segments per clip
    num_classes: int = 28      # AVE foreground classes (bg = 28)
    d_model: int = 256         # temporal-attention / CMBS dim (net_trans.py:191)
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class AVVPModelConfig:
    """AVVP (`MGN_Net`, `DG-SCT/AVVP/nets/mgn.py:417-763`) model config.
    Defaults mirror AVVP/train.sh + main.py argparse (dim 128, depths 3/3/6,
    soft assignment)."""
    swin: SwinV2Config = dataclasses.field(default_factory=SwinV2Config)
    htsat: HTSATConfig = dataclasses.field(default_factory=HTSATConfig)
    adapter: AdapterConfig = dataclasses.field(default_factory=AdapterConfig)
    num_frames: int = 10
    num_classes: int = 25
    dim: int = 128
    depth_aud: int = 3
    depth_vis: int = 3
    depth_av: int = 6
    unimodal_assign: str = "soft"
    crossmodal_assign: str = "soft"
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class AVSModelConfig:
    """AVS segmentation model (`Pred_endecoder`,
    `DG-SCT/AVS/avs_scripts/avs_s4/model/PVT_AVSModel.py:584-988`).

    Adapter flags come from avs_s4/base_options.py + train.sh: `--num_tokens
    32 --Adapter_downsample 8` on the command line, `is_bn 0`, `is_gate 0`,
    `num_conv_group 2` defaults (base_options.py:53-70). As in AVQA, the
    VISUAL adapters hardcode `use_gate=True` (PVT_AVSModel.py:712,721) while
    the audio ones take `opt.is_gate` (=0)."""
    swin: SwinV2Config = dataclasses.field(default_factory=SwinV2Config)
    htsat: HTSATConfig = dataclasses.field(default_factory=HTSATConfig)
    adapter: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(num_tokens=32, use_bn=False,
                                              use_gate=False, avs_variant=True))
    adapter_vis: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(num_tokens=32, use_bn=False,
                                              use_gate=True, avs_variant=True))
    num_frames: int = 5
    channel: int = 256
    mask_size: int = 224
    tpavi_stages: tuple = (0, 1, 2, 3)
    tpavi_vv_flag: bool = False
    tpavi_va_flag: bool = True
    # decoder scale grid: (stage resolution -> pvt-style resolution)
    scale_sizes: tuple = (56, 28, 14, 7)
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class AVQAModelConfig:
    """AVQA stage-2 (`AVQA_Fusion_Net`, `net_grd_avst/net_avst.py:264-626`).
    Question vocab 93 (live-built, max_len 14), answer vocab 42.

    AVQA's adapters differ from AVE's: `net_grd_avst/base_options.py:70-81`
    defaults `is_bn 0`, `is_gate 0`, `num_conv_group 4`, and train.sh passes
    `--num_tokens 2`; the VISUAL adapters hardcode `use_gate=True`
    (net_avst.py:402,412) while the audio ones take `opt.is_gate` (=0)."""
    swin: SwinV2Config = dataclasses.field(default_factory=SwinV2Config)
    htsat: HTSATConfig = dataclasses.field(default_factory=HTSATConfig)
    adapter: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(num_tokens=2, num_conv_group=4,
                                              use_bn=False, use_gate=False))
    adapter_vis: AdapterConfig = dataclasses.field(
        default_factory=lambda: AdapterConfig(num_tokens=2, num_conv_group=4,
                                              use_bn=False, use_gate=True))
    num_frames: int = 10
    embed_dim: int = 1536
    qst_vocab_size: int = 93
    ans_vocab_size: int = 42
    max_qst_len: int = 14
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """OpenAI CLIP ViT-B/32 (vendored at `pretrain/nets/clip/model.py`)."""
    image_size: int = 224
    vision_patch: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    embed_dim: int = 512
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8


@dataclasses.dataclass(frozen=True)
class PromptConfig:
    """CoOp/CoCoOp prompt learning (`pretrain/nets/prompt_learner.py:131-283`)."""
    n_ctx: int = 4
    ctx_init: str = "a photo of a"
    class_token_position: str = "end"
    weak: bool = True  # weak=False appends a 'background' class


@dataclasses.dataclass(frozen=True)
class PretrainModelConfig:
    """Pretrain suite model (`pretrain/nets/net_trans.py:601-970`):
    CLIP ViT-B/32 x CLAP-HTSAT interleave with per-block adapter pairs."""
    clip: CLIPConfig = dataclasses.field(default_factory=CLIPConfig)
    htsat: HTSATConfig = dataclasses.field(default_factory=HTSATConfig)
    adapter: AdapterConfig = dataclasses.field(default_factory=AdapterConfig)
    prompt: PromptConfig = dataclasses.field(default_factory=PromptConfig)
    num_frames: int = 10
    num_classes: int = 141  # VGGSound-AVEL 40K categories
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """AVE training recipe. Reference: `DG-SCT/AVE/main_trans.py` + `train.sh`
    (bs 8, accum 2, lr 5e-4, StepLR decay_epoch/decay, early_stop)."""
    batch_size: int = 8
    accum_steps: int = 2
    lr: float = 5e-4
    lr_mlp: float = 5e-4
    decay_epoch: int = 10
    decay: float = 0.1
    epochs: int = 50
    early_stop: int = 10
    seed: int = 43
    mixup_alpha: float = 0.5


def ave_paired_layout(swin: SwinV2Config, htsat: HTSATConfig):
    """Static pairing plan for the interleaved dual-tower loop.

    Mirrors the 18-vs-6 block map at `DG-SCT/AVE/nets/net_trans.py:880-886`:
    when a visual stage has more blocks than the audio stage, audio blocks sit at
    visual indices 2,5,8,... and other visual blocks run un-paired.

    Returns a list of per-stage lists; each entry is `(vis_block_idx, audio_block_idx
    or None, paired_adapter_idx or None)`.
    """
    plan = []
    adapter_idx = 0
    for s in range(len(swin.depths)):
        vd, ad = swin.depths[s], htsat.depths[s]
        stage = []
        if vd == ad:
            for b in range(vd):
                stage.append((b, b, adapter_idx))
                adapter_idx += 1
        else:
            # audio block j is placed at visual index 3*j + 2
            audio_at = {3 * j + 2: j for j in range(ad)}
            assert 3 * ad == vd, (vd, ad)
            for b in range(vd):
                if b in audio_at:
                    stage.append((b, audio_at[b], adapter_idx))
                    adapter_idx += 1
                else:
                    stage.append((b, None, None))
        plan.append(stage)
    return plan


def ave_adapter_dims(swin: SwinV2Config, htsat: HTSATConfig):
    """Per-paired-block dims: (vis_dim, vis_tokens, audio_dim, audio_tokens).

    Mirrors the dims scan at `net_trans.py:781-797` (dims recorded per *visual* block
    paired with an audio block, at that stage's resolution)."""
    dims = []
    for s, stage in enumerate(ave_paired_layout(swin, htsat)):
        vr = swin.stage_resolution(s)
        ar = htsat.stage_resolution(s)
        for (_, ab, ai) in stage:
            if ai is None:
                continue
            dims.append((swin.stage_dim(s), vr[0] * vr[1], htsat.stage_dim(s), ar[0] * ar[1]))
    return dims
