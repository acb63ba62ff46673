"""SAM (Segment Anything) in pure-functional JAX.

Replaces the reference's SAM/MobileSAM dependency used for box-prompted
mask generation inside the grounding tracker
(grounding_evaluation/grounding_new_api.py:67-71, :410-428).

TPU design: the image encoder runs once per frame (batched over
frames); box prompts are batched through the lightweight mask decoder —
the reference loops SamPredictor per box, here all boxes of a frame are
one decoder call with static max_boxes padding.

Weight layout converts from HF SamModel state dicts (facebook/sam-vit-*).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from video_llava_tpu.models.layers import layer_norm, linear
from video_llava_tpu.ops.attention import attention_reference


@dataclasses.dataclass(frozen=True)
class SamVisionConfig:
    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    output_channels: int = 256
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


@dataclasses.dataclass(frozen=True)
class SamConfig:
    vision: SamVisionConfig = dataclasses.field(default_factory=SamVisionConfig)
    prompt_hidden: int = 256
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_mask_tokens: int = 4  # 1 "whole" + 3 multimask
    layer_norm_eps: float = 1e-6

    @classmethod
    def tiny_test(cls):
        return cls(
            vision=SamVisionConfig(
                image_size=64,
                patch_size=8,
                hidden_size=32,
                num_layers=2,
                num_heads=2,
                mlp_dim=64,
                window_size=2,
                global_attn_indexes=(1,),
                output_channels=16,
            ),
            prompt_hidden=16,
            decoder_heads=2,
            decoder_mlp_dim=32,
        )


# -- vision encoder -------------------------------------------------------------


def _get_rel_pos(q_size: int, k_size: int, rel_pos: jax.Array) -> jax.Array:
    """(2*max(q,k)-1, d) table -> (q, k, d) gathered relative positions
    (SAM's get_rel_pos; equal sizes here, no interpolation needed)."""
    max_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_dist:
        # linear interpolation to the needed length
        rel_pos = jax.image.resize(
            rel_pos, (max_dist, rel_pos.shape[1]), method="linear"
        )
    q = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    idx = (q - k + (k_size - 1) * max(q_size / k_size, 1.0)).astype(jnp.int32)
    return rel_pos[idx]


def _vision_attention(p, x, num_heads: int):
    """x: (B, H, W, C) -> same, with decomposed relative positions."""
    b, hh, ww, c = x.shape
    hd = c // num_heads
    qkv = linear(p["qkv"], x.reshape(b, hh * ww, c)).reshape(
        b, hh * ww, 3, num_heads, hd
    )
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = hd**-0.5
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    # decomposed rel pos: logits += q . Rh + q . Rw
    rh = _get_rel_pos(hh, hh, p["rel_pos_h"])  # (h, h, hd)
    rw = _get_rel_pos(ww, ww, p["rel_pos_w"])  # (w, w, hd)
    qg = q.reshape(b, hh, ww, num_heads, hd)
    bias_h = jnp.einsum("byxhd,ykd->bhyxk", qg, rh.astype(qg.dtype)) * scale
    bias_w = jnp.einsum("byxhd,xkd->bhyxk", qg, rw.astype(qg.dtype)) * scale
    logits = logits.reshape(b, num_heads, hh, ww, hh, ww)
    logits = logits + bias_h[..., :, None] + bias_w[..., None, :]
    logits = logits.reshape(b, num_heads, hh * ww, hh * ww)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return linear(p["proj"], out.reshape(b, hh * ww, c)).reshape(b, hh, ww, c)


def _window_partition_pad(x, w):
    b, hh, ww, c = x.shape
    ph = (w - hh % w) % w
    pw = (w - ww % w) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = hh + ph, ww + pw
    wins = x.reshape(b, hp // w, w, wp // w, w, c).transpose(0, 1, 3, 2, 4, 5)
    return wins.reshape(-1, w, w, c), (hp, wp)


def _window_unpartition(wins, w, pad_hw, hw):
    hp, wp = pad_hw
    hh, ww = hw
    b = wins.shape[0] // ((hp // w) * (wp // w))
    x = wins.reshape(b, hp // w, wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :hh, :ww]


def vision_encoder(params, pixels: jax.Array, cfg: SamVisionConfig) -> jax.Array:
    """(b, H, W, 3) normalized -> image embeddings (b, grid, grid, out_c)."""
    ps = cfg.patch_size
    b, H, W, _ = pixels.shape
    x = pixels.reshape(b, H // ps, ps, W // ps, ps, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, H // ps, W // ps, -1)
    # Activations follow the PARAMETER dtype (not the pixel dtype):
    # bf16 checkpoints fed f32-normalized pixels otherwise reach the
    # neck conv with f32 activations vs bf16 kernels, which
    # conv_general_dilated rejects.
    x = jnp.dot(
        x, params["patch_embed"]["kernel"], preferred_element_type=jnp.float32
    ).astype(params["patch_embed"]["kernel"].dtype) + params["patch_embed"]["bias"]
    x = x + params["pos_embed"][0].astype(x.dtype)

    for i, lp in enumerate(params["layers"]):
        shortcut = x
        h = layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
        if i in cfg.global_attn_indexes:
            h = _vision_attention(lp, h, cfg.num_heads)
        else:
            wins, pad_hw = _window_partition_pad(h, cfg.window_size)
            wins = _vision_attention(lp, wins, cfg.num_heads)
            h = _window_unpartition(
                wins, cfg.window_size, pad_hw, (x.shape[1], x.shape[2])
            )
        x = shortcut + h
        h = layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
        x = x + linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], h),
                                              approximate=False))

    # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (channel LN == LN over
    # the trailing dim in NHWC)
    x = jnp.einsum(
        "bhwc,co->bhwo", x, params["neck"]["conv1"],
    ).astype(x.dtype)
    x = layer_norm(params["neck"]["ln1"], x, cfg.layer_norm_eps)
    x = jax.lax.conv_general_dilated(
        x, params["neck"]["conv2"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    x = layer_norm(params["neck"]["ln2"], x, cfg.layer_norm_eps)
    return x


# -- prompt encoder --------------------------------------------------------------


def _pe_encode(coords: jax.Array, gaussian: jax.Array) -> jax.Array:
    """coords in [0,1] (..., 2) -> (..., 2*feat) random-fourier PE."""
    c = 2.0 * coords - 1.0
    proj = (c @ gaussian.astype(jnp.float32)) * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def image_positional_embedding(params, grid: int) -> jax.Array:
    """(grid, grid, d) positional encoding of pixel centers."""
    g = params["shared_pe"]  # (2, d/2)
    ys = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    xs = (jnp.arange(grid, dtype=jnp.float32) + 0.5) / grid
    coords = jnp.stack(
        jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
    )  # (grid, grid, 2) with (x, y)
    return _pe_encode(coords, g)


def encode_boxes(params, boxes: jax.Array, image_size: int) -> jax.Array:
    """boxes: (b, n, 4) xyxy in input pixels -> sparse embeddings
    (b, n*2, d). SAM semantics: +0.5 pixel-center shift, corner type
    embeddings 2 (top-left) and 3 (bottom-right)."""
    b, n, _ = boxes.shape
    pts = (boxes.reshape(b, n, 2, 2) + 0.5) / image_size
    pe = _pe_encode(pts, params["shared_pe"])  # (b, n, 2, d)
    pe = pe.at[:, :, 0].add(params["point_embed"][2])
    pe = pe.at[:, :, 1].add(params["point_embed"][3])
    return pe.reshape(b, n * 2, -1)


# -- mask decoder ----------------------------------------------------------------


def _decoder_attention(p, q, k, v, num_heads: int):
    b, nq, _ = q.shape
    nk = k.shape[1]
    qh = linear(p["q"], q)
    kh = linear(p["k"], k)
    vh = linear(p["v"], v)
    inner = qh.shape[-1]
    hd = inner // num_heads
    out = attention_reference(
        qh.reshape(b, nq, num_heads, hd),
        kh.reshape(b, nk, num_heads, hd),
        vh.reshape(b, nk, num_heads, hd),
    )
    return linear(p["o"], out.reshape(b, nq, inner))


def _two_way_layer(p, queries, keys, query_pe, key_pe, heads, eps,
                   skip_first_pe: bool):
    if skip_first_pe:
        queries = queries + _decoder_attention(
            p["self_attn"], queries, queries, queries, heads
        )
    else:
        q = queries + query_pe
        queries = queries + _decoder_attention(p["self_attn"], q, q, queries, heads)
    queries = layer_norm(p["ln1"], queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _decoder_attention(
        p["cross_attn_t2i"], q, k, keys, heads
    )
    queries = layer_norm(p["ln2"], queries, eps)

    queries = queries + linear(
        p["fc2"], jax.nn.relu(linear(p["fc1"], queries))
    )
    queries = layer_norm(p["ln3"], queries, eps)

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _decoder_attention(p["cross_attn_i2t"], k, q, queries, heads)
    keys = layer_norm(p["ln4"], keys, eps)
    return queries, keys


def _mlp3(p, x, final_act=None):
    x = jax.nn.relu(linear(p["lin0"], x))
    x = jax.nn.relu(linear(p["lin1"], x))
    x = linear(p["lin2"], x)
    return final_act(x) if final_act else x


def decode_masks(
    params,
    image_embeddings: jax.Array,  # (b, g, g, d)
    sparse_prompts: jax.Array,  # (b, n_prompt_tokens, d)
    cfg: SamConfig,
    multimask: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """-> (masks (b, n_masks, 4g, 4g) logits, iou_pred (b, n_masks))."""
    dec = params["mask_decoder"]
    b, g, _, d = image_embeddings.shape
    eps = cfg.layer_norm_eps

    out_tokens = jnp.concatenate(
        [dec["iou_token"], dec["mask_tokens"]], axis=0
    )  # (1+num_mask_tokens, d)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(out_tokens, (b,) + out_tokens.shape), sparse_prompts],
        axis=1,
    )
    src = image_embeddings + params["no_mask_embed"][0]
    src = src.reshape(b, g * g, d)
    pos = image_positional_embedding(params, g).reshape(1, g * g, d)
    pos = jnp.broadcast_to(pos, (b, g * g, d)).astype(src.dtype)

    queries, keys = tokens, src
    for i, lp in enumerate(dec["layers"]):
        queries, keys = _two_way_layer(
            lp, queries, keys, tokens, pos, cfg.decoder_heads, eps,
            skip_first_pe=(i == 0),
        )
    q = queries + tokens
    k = keys + pos
    queries = queries + _decoder_attention(
        dec["final_attn"], q, k, keys, cfg.decoder_heads
    )
    queries = layer_norm(dec["ln_final"], queries, eps)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1 : 1 + cfg.num_mask_tokens]

    # upscale image features 4x: two stride-2 transposed convs (k=2)
    x = keys.reshape(b, g, g, d)

    def conv_t(x, w, bias):
        # w: (in, out, 2, 2); stride-2 k=2 transposed conv == einsum
        y = jnp.einsum("bhwc,coij->bhiwjo", x, w.astype(jnp.float32))
        bb, hh, _, ww, _, oo = y.shape
        return y.reshape(bb, hh * 2, ww * 2, oo).astype(x.dtype) + bias

    x = conv_t(x, dec["up1"]["kernel"], dec["up1"]["bias"])
    x = layer_norm(dec["up_ln"], x, eps)
    x = jax.nn.gelu(x, approximate=False)
    x = conv_t(x, dec["up2"]["kernel"], dec["up2"]["bias"])
    x = jax.nn.gelu(x, approximate=False)  # (b, 4g, 4g, c_up)

    hyper = jnp.stack(
        [
            _mlp3(dec["hyper_mlps"][i], mask_tokens_out[:, i])
            for i in range(cfg.num_mask_tokens)
        ],
        axis=1,
    )  # (b, n_tokens, c_up)
    masks = jnp.einsum(
        "bnc,bhwc->bnhw", hyper, x, preferred_element_type=jnp.float32
    )
    iou = _mlp3(dec["iou_head"], iou_token_out)
    if multimask:
        return masks[:, 1:], iou[:, 1:]
    return masks[:, :1], iou[:, :1]


def predict_from_embeddings(
    params, emb: jax.Array, boxes: jax.Array, cfg: SamConfig,
    multimask: bool = True,
):
    """Prompt-encode + mask-decode against precomputed image embeddings.

    emb: (b, g, g, d) from vision_encoder; boxes: (b, n, 4) xyxy pixels.
    Each box decodes independently (SAM semantics): returns
    (masks (b, n, n_masks, 4g, 4g), iou (b, n, n_masks)). Splitting the
    heavy encoder from this cheap decode lets the tracker batch-encode
    its detection frames upfront (the reference re-runs SamPredictor's
    encoder per set_image, grounding_new_api.py:410-428).
    """
    b, n, _ = boxes.shape
    sparse = encode_boxes(params, boxes, cfg.vision.image_size)  # (b, 2n, d)
    sparse = sparse.reshape(b * n, 2, -1)
    emb_rep = jnp.repeat(emb, n, axis=0)
    masks, iou = decode_masks(params, emb_rep, sparse.astype(emb.dtype), cfg,
                              multimask)
    g4 = emb.shape[1] * 4
    return (
        masks.reshape(b, n, -1, g4, g4),
        iou.reshape(b, n, -1),
    )


def predict_boxes(
    params, pixels: jax.Array, boxes: jax.Array, cfg: SamConfig,
    multimask: bool = True,
):
    """Full pipeline for one image batch + per-image boxes.

    pixels: (b, H, W, 3) normalized; boxes: (b, n, 4) xyxy pixels.
    Returns (masks (b, n, n_masks, 4g, 4g), iou (b, n, n_masks)).
    """
    emb = vision_encoder(params["vision"], pixels, cfg.vision)
    return predict_from_embeddings(params, emb, boxes, cfg, multimask)


# -- official-repo conversion -------------------------------------------------


def convert_official_sam_decoder(sd, cfg: SamConfig, dtype=jnp.float32):
    """Original segment-anything / MobileSAM checkpoint layout
    (`mobile_sam.pt`, `sam_vit_*.pth`): prompt_encoder.* +
    mask_decoder.* keys -> our non-vision params. MobileSAM reuses
    SAM's prompt encoder and mask decoder verbatim, so this converter
    serves both; pair it with tiny_vit.convert_tiny_vit (image_encoder.*)
    for MobileSAM or a ViT converter for original SAM.

    Key differences vs the HF layout (convert_hf_sam):
    prompt_encoder.pe_layer.positional_encoding_gaussian_matrix ==
    shared_embedding.positional_embedding; point_embeddings.{i} ==
    point_embed.{i}; transformer norm{1..4} == layer_norm{1..4};
    output_upscaling.{0,1,3} == upscale_conv1 / upscale_layer_norm /
    upscale_conv2; MLPs store layers.{0,1,2} instead of
    proj_in/layers.0/proj_out.
    """

    def a(k):
        return np.asarray(sd[k], np.float32)

    def t(k):
        return np.ascontiguousarray(a(k).T)

    def attn(prefix):
        return {
            "q": {"kernel": t(prefix + "q_proj.weight"),
                  "bias": a(prefix + "q_proj.bias")},
            "k": {"kernel": t(prefix + "k_proj.weight"),
                  "bias": a(prefix + "k_proj.bias")},
            "v": {"kernel": t(prefix + "v_proj.weight"),
                  "bias": a(prefix + "v_proj.bias")},
            "o": {"kernel": t(prefix + "out_proj.weight"),
                  "bias": a(prefix + "out_proj.bias")},
        }

    def ln(prefix):
        return {"scale": a(prefix + ".weight"), "bias": a(prefix + ".bias")}

    def mlp3(prefix):
        return {
            f"lin{i}": {"kernel": t(f"{prefix}layers.{i}.weight"),
                        "bias": a(f"{prefix}layers.{i}.bias")}
            for i in range(3)
        }

    dec_layers = []
    i = 0
    while f"mask_decoder.transformer.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"mask_decoder.transformer.layers.{i}."
        dec_layers.append(
            {
                "self_attn": attn(p + "self_attn."),
                "ln1": ln(p + "norm1"),
                "cross_attn_t2i": attn(p + "cross_attn_token_to_image."),
                "ln2": ln(p + "norm2"),
                "fc1": {"kernel": t(p + "mlp.lin1.weight"),
                        "bias": a(p + "mlp.lin1.bias")},
                "fc2": {"kernel": t(p + "mlp.lin2.weight"),
                        "bias": a(p + "mlp.lin2.bias")},
                "ln3": ln(p + "norm3"),
                "ln4": ln(p + "norm4"),
                "cross_attn_i2t": attn(p + "cross_attn_image_to_token."),
            }
        )
        i += 1

    params = {
        "shared_pe": a(
            "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
        ),
        "point_embed": np.stack(
            [a(f"prompt_encoder.point_embeddings.{i}.weight")[0]
             for i in range(4)]
        ),
        "no_mask_embed": a("prompt_encoder.no_mask_embed.weight"),
        "mask_decoder": {
            "iou_token": a("mask_decoder.iou_token.weight"),
            "mask_tokens": a("mask_decoder.mask_tokens.weight"),
            "layers": dec_layers,
            "final_attn": attn(
                "mask_decoder.transformer.final_attn_token_to_image."
            ),
            "ln_final": ln("mask_decoder.transformer.norm_final_attn"),
            # ConvTranspose2d weights are (in, out, kH, kW) — exactly
            # what decode_masks' conv_t einsum consumes.
            "up1": {"kernel": a("mask_decoder.output_upscaling.0.weight"),
                    "bias": a("mask_decoder.output_upscaling.0.bias")},
            "up_ln": ln("mask_decoder.output_upscaling.1"),
            "up2": {"kernel": a("mask_decoder.output_upscaling.3.weight"),
                    "bias": a("mask_decoder.output_upscaling.3.bias")},
            "hyper_mlps": [
                mlp3(f"mask_decoder.output_hypernetworks_mlps.{i}.")
                for i in range(cfg.num_mask_tokens)
            ],
            "iou_head": mlp3("mask_decoder.iou_prediction_head."),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


# -- HF conversion ----------------------------------------------------------------


def convert_hf_sam(sd, cfg: SamConfig, dtype=jnp.float32):
    def t(w):
        return np.ascontiguousarray(w.T)

    def attn(prefix):
        return {
            "q": {"kernel": t(sd[prefix + "q_proj.weight"]),
                  "bias": sd[prefix + "q_proj.bias"]},
            "k": {"kernel": t(sd[prefix + "k_proj.weight"]),
                  "bias": sd[prefix + "k_proj.bias"]},
            "v": {"kernel": t(sd[prefix + "v_proj.weight"]),
                  "bias": sd[prefix + "v_proj.bias"]},
            "o": {"kernel": t(sd[prefix + "out_proj.weight"]),
                  "bias": sd[prefix + "out_proj.bias"]},
        }

    def ln(prefix):
        return {"scale": sd[prefix + "weight"], "bias": sd[prefix + "bias"]}

    v = cfg.vision
    conv = sd["vision_encoder.patch_embed.projection.weight"]
    layers = []
    for i in range(v.num_layers):
        p = f"vision_encoder.layers.{i}."
        layers.append(
            {
                "ln1": ln(p + "layer_norm1."),
                "qkv": {"kernel": t(sd[p + "attn.qkv.weight"]),
                        "bias": sd[p + "attn.qkv.bias"]},
                "proj": {"kernel": t(sd[p + "attn.proj.weight"]),
                         "bias": sd[p + "attn.proj.bias"]},
                "rel_pos_h": sd[p + "attn.rel_pos_h"],
                "rel_pos_w": sd[p + "attn.rel_pos_w"],
                "ln2": ln(p + "layer_norm2."),
                "fc1": {"kernel": t(sd[p + "mlp.lin1.weight"]),
                        "bias": sd[p + "mlp.lin1.bias"]},
                "fc2": {"kernel": t(sd[p + "mlp.lin2.weight"]),
                        "bias": sd[p + "mlp.lin2.bias"]},
            }
        )
    dec_layers = []
    i = 0
    while f"mask_decoder.transformer.layers.{i}.self_attn.q_proj.weight" in sd:
        p = f"mask_decoder.transformer.layers.{i}."
        dec_layers.append(
            {
                "self_attn": attn(p + "self_attn."),
                "ln1": ln(p + "layer_norm1."),
                "cross_attn_t2i": attn(p + "cross_attn_token_to_image."),
                "ln2": ln(p + "layer_norm2."),
                "fc1": {"kernel": t(sd[p + "mlp.lin1.weight"]),
                        "bias": sd[p + "mlp.lin1.bias"]},
                "fc2": {"kernel": t(sd[p + "mlp.lin2.weight"]),
                        "bias": sd[p + "mlp.lin2.bias"]},
                "ln3": ln(p + "layer_norm3."),
                "ln4": ln(p + "layer_norm4."),
                "cross_attn_i2t": attn(p + "cross_attn_image_to_token."),
            }
        )
        i += 1

    def mlp3(prefix):
        return {
            "lin0": {"kernel": t(sd[prefix + "proj_in.weight"]),
                     "bias": sd[prefix + "proj_in.bias"]},
            "lin1": {"kernel": t(sd[prefix + "layers.0.weight"]),
                     "bias": sd[prefix + "layers.0.bias"]},
            "lin2": {"kernel": t(sd[prefix + "proj_out.weight"]),
                     "bias": sd[prefix + "proj_out.bias"]},
        }

    params = {
        "vision": {
            "patch_embed": {
                "kernel": conv.transpose(2, 3, 1, 0).reshape(-1, v.hidden_size),
                "bias": sd["vision_encoder.patch_embed.projection.bias"],
            },
            "pos_embed": sd["vision_encoder.pos_embed"],
            "layers": layers,
            "neck": {
                "conv1": sd["vision_encoder.neck.conv1.weight"][:, :, 0, 0].T,
                "ln1": ln("vision_encoder.neck.layer_norm1."),
                # (O, I, 3, 3) -> HWIO
                "conv2": sd["vision_encoder.neck.conv2.weight"].transpose(
                    2, 3, 1, 0
                ),
                "ln2": ln("vision_encoder.neck.layer_norm2."),
            },
        },
        "shared_pe": sd["prompt_encoder.shared_embedding.positional_embedding"],
        "point_embed": np.stack(
            [sd[f"prompt_encoder.point_embed.{i}.weight"][0] for i in range(4)]
        ),
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"],
        "mask_decoder": {
            "iou_token": sd["mask_decoder.iou_token.weight"],
            "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
            "layers": dec_layers,
            "final_attn": attn("mask_decoder.transformer.final_attn_token_to_image."),
            "ln_final": ln("mask_decoder.transformer.layer_norm_final_attn."),
            "up1": {"kernel": sd["mask_decoder.upscale_conv1.weight"],
                    "bias": sd["mask_decoder.upscale_conv1.bias"]},
            "up2": {"kernel": sd["mask_decoder.upscale_conv2.weight"],
                    "bias": sd["mask_decoder.upscale_conv2.bias"]},
            "up_ln": ln("mask_decoder.upscale_layer_norm."),
            "hyper_mlps": [
                mlp3(f"mask_decoder.output_hypernetworks_mlps.{i}.")
                for i in range(cfg.num_mask_tokens)
            ],
            "iou_head": mlp3("mask_decoder.iou_prediction_head."),
        },
    }
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
