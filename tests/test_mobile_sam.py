"""MobileSAM (TinyViT encoder + SAM decoder) tests.

1. Converter + forward parity: a torch module mirroring the official
   MobileSAM `tiny_vit_sam.py` layout (Conv2d_BN stem, MBConv stage,
   window-attention stages with trained attention biases, SAM neck) is
   randomly initialized — INCLUDING BatchNorm running stats, so the
   inference-time BN folding is exercised — its state_dict converted
   with `convert_tiny_vit`, and the full encoder output compared.
2. Official prompt-encoder/mask-decoder key layout: an HF SamModel
   state dict renamed to the original segment-anything key names must
   convert (convert_official_sam_decoder) to EXACTLY the tree
   convert_hf_sam produces — transferring test_sam.py's HF forward
   parity to the official layout.
3. build_sam(variant='mobile'): end-to-end segmenter masks + embedding
   cache parity + GroundedTracker integration (the reference's LIVE
   default segmenter, grounding_new_api.py:104).
"""

import dataclasses
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_llava_tpu.models import sam as sam_mod
from video_llava_tpu.models import tiny_vit as tv
from video_llava_tpu.models.sam import SamConfig, SamVisionConfig

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# -- torch mirror of the official tiny_vit_sam.py layout ----------------------


class TConv2dBN(nn.Sequential):
    def __init__(self, a, b, ks=1, stride=1, pad=0, groups=1):
        super().__init__()
        self.add_module(
            "c", nn.Conv2d(a, b, ks, stride, pad, groups=groups, bias=False)
        )
        self.add_module("bn", nn.BatchNorm2d(b))


class TPatchEmbed(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.seq = nn.Sequential(
            TConv2dBN(3, dim // 2, 3, 2, 1), nn.GELU(),
            TConv2dBN(dim // 2, dim, 3, 2, 1),
        )

    def forward(self, x):
        return self.seq(x)


class TMBConv(nn.Module):
    def __init__(self, dim, expand):
        super().__init__()
        h = int(dim * expand)
        self.conv1 = TConv2dBN(dim, h, 1)
        self.conv2 = TConv2dBN(h, h, 3, 1, 1, groups=h)
        self.conv3 = TConv2dBN(h, dim, 1)

    def forward(self, x):
        s = x
        x = F.gelu(self.conv1(x))
        x = F.gelu(self.conv2(x))
        x = self.conv3(x)
        return F.gelu(s + x)


class TPatchMerging(nn.Module):
    """Official: conv1 1x1 -> act -> depthwise 3x3 (stride 1 or 2) ->
    act -> conv3 1x1; tokens out."""

    def __init__(self, dim, out, stride, resolution):
        super().__init__()
        self.resolution = resolution
        self.conv1 = TConv2dBN(dim, out, 1)
        self.conv2 = TConv2dBN(out, out, 3, stride, 1, groups=out)
        self.conv3 = TConv2dBN(out, out, 1)

    def forward(self, x):
        if x.ndim == 3:
            h = w = self.resolution
            b = x.shape[0]
            x = x.view(b, h, w, -1).permute(0, 3, 1, 2)
        x = F.gelu(self.conv1(x))
        x = F.gelu(self.conv2(x))
        x = self.conv3(x)
        return x.flatten(2).transpose(1, 2)


class TAttention(nn.Module):
    """LeViT-style attention with trained per-offset biases
    (tiny_vit_sam.py Attention, attn_ratio=1)."""

    def __init__(self, dim, num_heads, resolution):
        super().__init__()
        self.num_heads = num_heads
        self.key_dim = dim // num_heads
        self.scale = self.key_dim ** -0.5
        self.norm = nn.LayerNorm(dim)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        pts = list(itertools.product(range(resolution), range(resolution)))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        self.attention_biases = nn.Parameter(
            torch.zeros(num_heads, len(offsets))
        )
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(pts), len(pts)),
            persistent=True,
        )

    def forward(self, x):  # (b, N, C)
        b, n, c = x.shape
        x = self.norm(x)
        qkv = self.qkv(x).view(b, n, self.num_heads, -1)
        q, k, v = qkv.split([self.key_dim, self.key_dim, self.key_dim], dim=3)
        q, k, v = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        attn = (q @ k.transpose(-2, -1)) * self.scale + (
            self.attention_biases[:, self.attention_bias_idxs]
        )
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(self.norm(x))))


class TTinyViTBlock(nn.Module):
    def __init__(self, dim, num_heads, window, resolution, mlp_ratio,
                 local_k):
        super().__init__()
        self.resolution = resolution
        self.window = window
        self.attn = TAttention(dim, num_heads, window)
        self.local_conv = TConv2dBN(dim, dim, local_k, 1, local_k // 2,
                                    groups=dim)
        self.mlp = TMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):  # (b, L, C)
        hh = ww = self.resolution
        b, L, c = x.shape
        res = x
        ws = self.window
        if hh == ws and ww == ws:
            x = self.attn(x)
        else:
            x = x.view(b, hh, ww, c)
            pb = (ws - hh % ws) % ws
            pr = (ws - ww % ws) % ws
            if pb or pr:
                x = F.pad(x, (0, 0, 0, pr, 0, pb))
            ph, pw = hh + pb, ww + pr
            nh, nw = ph // ws, pw // ws
            x = (
                x.view(b, nh, ws, nw, ws, c).transpose(2, 3)
                .reshape(b * nh * nw, ws * ws, c)
            )
            x = self.attn(x)
            x = (
                x.view(b, nh, nw, ws, ws, c).transpose(2, 3)
                .reshape(b, ph, pw, c)
            )
            if pb or pr:
                x = x[:, :hh, :ww].contiguous()
            x = x.view(b, L, c)
        x = res + x
        x = x.transpose(1, 2).reshape(b, c, hh, ww)
        x = self.local_conv(x)
        x = x.view(b, c, L).transpose(1, 2)
        return x + self.mlp(x)


class TLayerNorm2d(nn.Module):
    def __init__(self, c, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(c))
        self.bias = nn.Parameter(torch.zeros(c))
        self.eps = eps

    def forward(self, x):  # (b, c, h, w)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class TStage(nn.Module):
    """One layers[i] entry: .blocks + optional .downsample (official
    BasicLayer/ConvLayer naming)."""

    def __init__(self, blocks, downsample=None):
        super().__init__()
        self.blocks = nn.ModuleList(blocks)
        if downsample is not None:
            self.downsample = downsample


class TTinyViT(nn.Module):
    """Mirror of tiny_vit_sam.TinyViT (the MobileSAM image encoder):
    patch_embed.seq.{0,2}, layers.{0..3} (.blocks / .downsample),
    neck.{0..3}; final patch-merge stride follows cfg.merge_stride."""

    def __init__(self, cfg: tv.TinyViTConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.embed_dims
        self.patch_embed = TPatchEmbed(d[0])
        layers = []
        layers.append(
            TStage(
                [TMBConv(d[0], cfg.mbconv_expand)
                 for _ in range(cfg.depths[0])],
                TPatchMerging(d[0], d[1], cfg.merge_stride(0),
                              cfg.stage_resolution(0)),
            )
        )
        for i in range(1, len(d)):
            r = cfg.stage_resolution(i)
            blocks = [
                TTinyViTBlock(d[i], cfg.num_heads[i], cfg.window_sizes[i],
                              r, cfg.mlp_ratio, cfg.local_conv_size)
                for _ in range(cfg.depths[i])
            ]
            down = (
                TPatchMerging(d[i], d[i + 1], cfg.merge_stride(i), r)
                if i < len(d) - 1 else None
            )
            layers.append(TStage(blocks, down))
        self.layers = nn.ModuleList(layers)
        self.neck = nn.Sequential(
            nn.Conv2d(d[-1], cfg.output_channels, 1, bias=False),
            TLayerNorm2d(cfg.output_channels),
            nn.Conv2d(cfg.output_channels, cfg.output_channels, 3,
                      padding=1, bias=False),
            TLayerNorm2d(cfg.output_channels),
        )

    def forward(self, x):  # (b, 3, S, S)
        x = self.patch_embed(x)
        for b in self.layers[0].blocks:
            x = b(x)
        x = self.layers[0].downsample(x)  # -> tokens
        for i in range(1, len(self.layers)):
            st = self.layers[i]
            for b in st.blocks:
                x = b(x)
            if getattr(st, "downsample", None) is not None:
                x = st.downsample(x)
        g = self.cfg.grid
        b = x.shape[0]
        x = x.view(b, g, g, -1).permute(0, 3, 1, 2)
        return self.neck(x)


def _randomize(module, seed=0):
    """Random params AND BatchNorm running stats (the converter folds
    them; folding bugs are invisible with default zero-mean/unit-var)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g)
                )
                m.weight.copy_(
                    0.5 + torch.rand(m.weight.shape, generator=g)
                )
    module.eval()
    return module


TEST_CFG = tv.TinyViTConfig(
    image_size=64,
    embed_dims=(8, 12, 16, 20),
    depths=(1, 1, 2, 1),
    num_heads=(2, 2, 2, 2),
    # stage2 resolution == window (4): covers the no-partition branch;
    # stages 1/3 cover the window-partition branch.
    window_sizes=(2, 2, 4, 2),
    output_channels=16,
)


@pytest.fixture(scope="module")
def mirror_pair():
    tm = _randomize(TTinyViT(TEST_CFG), seed=3)
    sd = {
        "image_encoder." + k: v.detach().numpy()
        for k, v in tm.state_dict().items()
    }
    params = tv.convert_tiny_vit(sd, TEST_CFG)
    return tm, params


def test_tiny_vit_converter_forward_parity(mirror_pair):
    tm, params = mirror_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(tv.encoder(params, jnp.asarray(x), TEST_CFG))
    # ours is NHWC
    np.testing.assert_allclose(
        got, want.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
    )
    assert got.shape == (2, TEST_CFG.grid, TEST_CFG.grid, 16)


def test_tiny_vit_bias_index_matches_official_buffer():
    tm = TTinyViT(TEST_CFG)
    for i, ws in enumerate(TEST_CFG.window_sizes[1:], start=1):
        buf = tm.layers[i].blocks[0].attn.attention_bias_idxs.numpy()
        idx, n_off = tv.attention_bias_index(ws)
        np.testing.assert_array_equal(idx, buf)
        assert n_off == int(buf.max()) + 1


def test_tiny_vit_converter_without_idx_buffer(mirror_pair):
    """Some exports strip non-persistent buffers; the converter must
    rebuild attention_bias_idxs itself and produce the same params."""
    tm, params = mirror_pair
    sd = {
        "image_encoder." + k: v.detach().numpy()
        for k, v in tm.state_dict().items()
        if "attention_bias_idxs" not in k
    }
    params2 = tv.convert_tiny_vit(sd, TEST_CFG)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)
        ),
        params, params2,
    )


# -- official prompt-encoder / mask-decoder layout ----------------------------


_HF_TO_OFFICIAL = [
    ("prompt_encoder.shared_embedding.positional_embedding",
     "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"),
    ("prompt_encoder.point_embed.", "prompt_encoder.point_embeddings."),
    (".layer_norm1.", ".norm1."),
    (".layer_norm2.", ".norm2."),
    (".layer_norm3.", ".norm3."),
    (".layer_norm4.", ".norm4."),
    ("transformer.layer_norm_final_attn", "transformer.norm_final_attn"),
    ("mask_decoder.upscale_conv1.", "mask_decoder.output_upscaling.0."),
    ("mask_decoder.upscale_layer_norm.", "mask_decoder.output_upscaling.1."),
    ("mask_decoder.upscale_conv2.", "mask_decoder.output_upscaling.3."),
]

_MLP_HEADS = tuple(
    f"output_hypernetworks_mlps.{i}." for i in range(4)
) + ("iou_prediction_head.",)


def _to_official(sd):
    """HF SamModel keys -> original segment-anything keys (the inverse
    of transformers' convert_sam_original_to_hf_format rename)."""
    out = {}
    for k, v in sd.items():
        nk = k
        if any(h in nk for h in _MLP_HEADS):
            # HF SamMLP: proj_in / layers.0 (middle) / proj_out;
            # official MLP keeps all three in self.layers = 0/1/2.
            if ".proj_in." in nk:
                nk = nk.replace(".proj_in.", ".layers.0.")
            elif ".layers.0." in nk:
                nk = nk.replace(".layers.0.", ".layers.1.")
            elif ".proj_out." in nk:
                nk = nk.replace(".proj_out.", ".layers.2.")
        for a, b in _HF_TO_OFFICIAL:
            nk = nk.replace(a, b)
        out[nk] = v
    return out


@pytest.fixture(scope="module")
def tiny_sam_cfg():
    return SamConfig.tiny_test()


def _hf_sd(cfg):
    import transformers

    hf = transformers.SamModel(
        transformers.SamConfig(
            vision_config=dict(
                hidden_size=cfg.vision.hidden_size,
                num_hidden_layers=cfg.vision.num_layers,
                num_attention_heads=cfg.vision.num_heads,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
                global_attn_indexes=list(cfg.vision.global_attn_indexes),
                window_size=cfg.vision.window_size,
                mlp_dim=cfg.vision.mlp_dim,
                output_channels=cfg.vision.output_channels,
                num_pos_feats=cfg.prompt_hidden // 2,
            ),
            prompt_encoder_config=dict(
                hidden_size=cfg.prompt_hidden,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
            ),
            mask_decoder_config=dict(
                hidden_size=cfg.prompt_hidden,
                num_attention_heads=cfg.decoder_heads,
                mlp_dim=cfg.decoder_mlp_dim,
            ),
        )
    ).eval()
    return {k: v.detach().numpy() for k, v in hf.state_dict().items()}


def test_official_decoder_layout_matches_hf_conversion(tiny_sam_cfg):
    """Tree-exact: official-key conversion == HF-key conversion, so the
    HF forward-parity tests in test_sam.py cover the official layout."""
    cfg = tiny_sam_cfg
    sd = _hf_sd(cfg)
    want = sam_mod.convert_hf_sam(sd, cfg)
    got = sam_mod.convert_official_sam_decoder(_to_official(sd), cfg)
    want_dec = {k: v for k, v in want.items() if k != "vision"}
    assert jax.tree.structure(want_dec) == jax.tree.structure(got)
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y)
        ),
        want_dec, got,
    )


# -- end-to-end mobile segmenter ----------------------------------------------


@pytest.fixture(scope="module")
def mobile_segmenter():
    from video_llava_tpu.grounding.builders import build_sam

    cfg = dataclasses.replace(
        SamConfig.tiny_test(),
        vision=dataclasses.replace(
            SamConfig.tiny_test().vision, image_size=64, output_channels=16,
        ),
        prompt_hidden=16,
    )
    with pytest.warns(UserWarning):
        return build_sam(
            None, cfg=cfg, variant="mobile",
            tiny_cfg=tv.TinyViTConfig.tiny_test(),
        )


def test_mobile_segmenter_masks(mobile_segmenter):
    rng = np.random.default_rng(1)
    frame = rng.integers(0, 255, size=(48, 80, 3)).astype(np.uint8)
    boxes = np.asarray([[5, 5, 40, 40], [10, 8, 70, 30]], np.float32)
    masks = mobile_segmenter(frame, boxes)
    assert masks.shape == (2, 48, 80)
    assert set(np.unique(masks)) <= {0.0, 1.0}


def test_mobile_segmenter_cache_parity(mobile_segmenter):
    seg = mobile_segmenter
    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 255, size=(48, 80, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    boxes = np.asarray([[4, 4, 30, 44]], np.float32)
    want = [seg(f, boxes) for f in frames]
    seg.clear_cache()
    seg.precompute_embeddings(frames, [0, 1, 2], batch_size=2)
    assert seg.num_cached_embeddings() == 3
    got = [seg(f, boxes, frame_index=i) for i, f in enumerate(frames)]
    assert seg.num_cached_embeddings() == 0  # consumed
    for w, g in zip(want, got):
        np.testing.assert_allclose(w, g, atol=1e-5)


def test_mobile_segmenter_in_grounded_tracker(mobile_segmenter):
    from video_llava_tpu.grounding.memory_tracker import TrackerConfig
    from video_llava_tpu.grounding.tracker import GroundedTracker

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 255, size=(48, 80, 3)).astype(np.uint8)
        for _ in range(5)
    ]

    def det(image, prompts):
        return (
            np.asarray([[8, 8, 40, 40]], np.float32),
            np.asarray([0.9], np.float32),
            np.asarray([0], np.int64),
        )

    tracker = GroundedTracker(
        detector=det, segmenter=mobile_segmenter, detection_every=2,
        tracker_cfg=TrackerConfig(max_objects=2, patch=4),
    )
    results = tracker.run_on_list_of_images(frames, ["thing"])
    assert len(results) == 5
    assert results[0].masks.shape == (2, 48, 80)
