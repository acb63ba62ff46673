"""XMem propagation-network tests.

1. Memory-read parity vs the torch XMem anisotropic-similarity
   formulation on random tensors.
2. Converter + forward parity: a torch module mirroring the official
   XMem checkpoint layout (key_encoder/key_proj/value_encoder/decoder
   with torchvision-style trunks, written here from the paper
   formulation) is randomly initialized, its state_dict converted, and
   every forward stage compared.
3. Session mechanics (ring buffer, shapes).
4. A shape-cue tracking problem (appearance change + near-position
   distractor) that the handcrafted-feature tracker CANNOT solve and a
   briefly-trained XMem solves — the justification for learned
   propagation (VERDICT round-1 missing #2).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from video_llava_tpu.models import xmem
from video_llava_tpu.models.resnet import ResNetTrunkConfig

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402


# -- torch reference (official XMem checkpoint layout, from the paper) --------


class TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, width, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.downsample = None
        if stride != 1 or cin != width:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, width, 1, stride, bias=False),
                nn.BatchNorm2d(width),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idt)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + idt)


def _make_layer(block, cin, width, n, stride):
    layers = [block(cin, width, stride)]
    cin = width * block.expansion
    for _ in range(n - 1):
        layers.append(block(cin, width, 1))
    return nn.Sequential(*layers), cin


class TTrunk(nn.Module):
    def __init__(self, block, sizes, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1, c = _make_layer(block, 64, 64, sizes[0], 1)
        self.layer2, c = _make_layer(block, c, 128, sizes[1], 2)
        self.layer3, c = _make_layer(block, c, 256, sizes[2], 2)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        f4 = self.layer1(x)
        f8 = self.layer2(f4)
        f16 = self.layer3(f8)
        return f4, f8, f16


class TGroupResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, 1, 1)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1)
        if cin != cout:
            self.downsample = nn.Conv2d(cin, cout, 3, 1, 1)
        else:
            self.downsample = None

    def forward(self, g):
        out = self.conv1(F.relu(g))
        out = self.conv2(F.relu(out))
        if self.downsample is not None:
            g = self.downsample(g)
        return out + g


class TChannelGate(nn.Module):
    def __init__(self, c, reduction=16):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Flatten(), nn.Linear(c, c // reduction), nn.ReLU(),
            nn.Linear(c // reduction, c),
        )

    def forward(self, x):
        b, c = x.shape[:2]
        avg = self.mlp(F.avg_pool2d(x, x.shape[2:]))
        mx = self.mlp(F.max_pool2d(x, x.shape[2:]))
        scale = torch.sigmoid(avg + mx).view(b, c, 1, 1)
        return x * scale


class TSpatialGate(nn.Module):
    class _BasicConv(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(2, 1, 7, 1, 3, bias=False)
            self.bn = nn.BatchNorm2d(1)

        def forward(self, x):
            return self.bn(self.conv(x))

    def __init__(self):
        super().__init__()
        self.spatial = self._BasicConv()

    def forward(self, x):
        comp = torch.cat(
            [x.max(dim=1, keepdim=True)[0], x.mean(dim=1, keepdim=True)], 1
        )
        return x * torch.sigmoid(self.spatial(comp))


class TCBAM(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.ChannelGate = TChannelGate(c)
        self.SpatialGate = TSpatialGate()

    def forward(self, x):
        return self.SpatialGate(self.ChannelGate(x))


class TFeatureFusion(nn.Module):
    def __init__(self, x_dim, g_dim, mid, out):
        super().__init__()
        self.block1 = TGroupResBlock(x_dim + g_dim, mid)
        self.attention = TCBAM(mid)
        self.block2 = TGroupResBlock(mid, out)

    def forward(self, x, g):
        # x: (1, Cx, h, w); g: (O, Cg, h, w)
        g = torch.cat([x.expand(g.shape[0], -1, -1, -1), g], 1)
        g = self.block1(g)
        r = self.attention(g)
        return self.block2(g + r)


def t_gru(transform, inputs, h):
    hd = h.shape[1]
    v = transform(torch.cat([inputs, h], 1))
    forget = torch.sigmoid(v[:, :hd])
    update = torch.sigmoid(v[:, hd : 2 * hd])
    cand = torch.tanh(v[:, 2 * hd :])
    return forget * h * (1 - update) + update * cand


class TKeyProjection(nn.Module):
    def __init__(self, in_dim, kd):
        super().__init__()
        self.key_proj = nn.Conv2d(in_dim, kd, 3, 1, 1)
        self.d_proj = nn.Conv2d(in_dim, 1, 3, 1, 1)
        self.e_proj = nn.Conv2d(in_dim, kd, 3, 1, 1)

    def forward(self, x):
        return (
            self.key_proj(x),
            self.d_proj(x) ** 2 + 1,
            torch.sigmoid(self.e_proj(x)),
        )


class TValueEncoder(nn.Module):
    def __init__(self, vd, hd):
        super().__init__()
        trunk = TTrunk(TBasic, (2, 2, 2), in_ch=5)
        self.conv1, self.bn1, self.maxpool = trunk.conv1, trunk.bn1, trunk.maxpool
        self.layer1, self.layer2, self.layer3 = (
            trunk.layer1, trunk.layer2, trunk.layer3,
        )
        self.fuser = TFeatureFusion(1024, 256, vd, vd)
        self.hidden_reinforce = nn.Module()
        self.hidden_reinforce.transform = nn.Conv2d(vd + hd, hd * 3, 3, 1, 1)

    def forward(self, image, f16, h, masks, others, deep_update=True):
        g = torch.cat(
            [image.expand(masks.shape[0], -1, -1, -1),
             masks[:, None], others[:, None]], 1
        )
        g = self.maxpool(F.relu(self.bn1(self.conv1(g))))
        g = self.layer3(self.layer2(self.layer1(g)))
        g = self.fuser(f16, g)
        if deep_update:
            h = t_gru(self.hidden_reinforce.transform, g, h)
        return g, h


class TDecoder(nn.Module):
    def __init__(self, vd, hd):
        super().__init__()
        self.fuser = TFeatureFusion(1024, vd + hd, 512, 512)
        self.hidden_update = nn.Module()
        self.hidden_update.g16_conv = nn.Conv2d(512, 256, 1)
        self.hidden_update.g8_conv = nn.Conv2d(256, 256, 1)
        self.hidden_update.g4_conv = nn.Conv2d(257, 256, 1)
        self.hidden_update.transform = nn.Conv2d(256 + hd, hd * 3, 3, 1, 1)
        self.up_16_8 = nn.Module()
        self.up_16_8.skip_conv = nn.Conv2d(512, 512, 3, 1, 1)
        self.up_16_8.out_conv = TGroupResBlock(512, 256)
        self.up_8_4 = nn.Module()
        self.up_8_4.skip_conv = nn.Conv2d(256, 256, 3, 1, 1)
        self.up_8_4.out_conv = TGroupResBlock(256, 256)
        self.pred = nn.Conv2d(256, 1, 3, 1, 1)

    def forward(self, f16, f8, f4, hidden, readout):
        g16 = self.fuser(f16, torch.cat([readout, hidden], 1))
        up = F.interpolate(g16, scale_factor=2, mode="bilinear",
                           align_corners=False)
        g8 = self.up_16_8.out_conv(self.up_16_8.skip_conv(f8) + up)
        up = F.interpolate(g8, scale_factor=2, mode="bilinear",
                           align_corners=False)
        g4 = self.up_8_4.out_conv(self.up_8_4.skip_conv(f4) + up)
        logits = self.pred(F.relu(g4))
        g4l = torch.cat([g4, logits], 1)
        mid = (
            self.hidden_update.g16_conv(g16)
            + self.hidden_update.g8_conv(
                F.interpolate(g8, scale_factor=0.5, mode="area"))
            + self.hidden_update.g4_conv(
                F.interpolate(g4l, scale_factor=0.25, mode="area"))
        )
        new_h = t_gru(self.hidden_update.transform, mid, hidden)
        logits = F.interpolate(logits, scale_factor=4, mode="bilinear",
                               align_corners=False)
        return logits[:, 0], new_h


class TXMem(nn.Module):
    def __init__(self, kd=64, vd=512, hd=64):
        super().__init__()
        self.key_encoder = TTrunk(TBottleneck, (3, 4, 6))
        self.key_proj = TKeyProjection(1024, kd)
        self.value_encoder = TValueEncoder(vd, hd)
        self.decoder = TDecoder(vd, hd)


def torch_read_memory(mk, ms, qk, qe, mv, top_k):
    """XMem get_similarity + top-k softmax + readout (paper eq. 4-6).
    mk: (M, Ck); ms: (M,); qk/qe: (N, Ck); mv: (M, O, Cv)."""
    ck = mk.shape[1]
    a_sq = mk.pow(2) @ qe.t()  # (M, N)
    two_ab = 2 * (mk @ (qk * qe).t())
    b_sq = (qe * qk.pow(2)).sum(1)  # (N,)
    sim = (-a_sq + two_ab - b_sq[None]) * ms[:, None] / np.sqrt(ck)
    values, indices = torch.topk(sim, k=top_k, dim=0)
    x_exp = (values - values.max(0, keepdim=True)[0]).exp()
    x_exp = x_exp / x_exp.sum(0, keepdim=True)
    aff = torch.zeros_like(sim).scatter_(0, indices, x_exp)  # (M, N)
    return torch.einsum("mn,moc->noc", aff, mv)


# -- fixtures -----------------------------------------------------------------


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    tm = TXMem().eval()
    # Non-trivial BN stats so folding is actually exercised.
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.7, 1.3)
    cfg = xmem.XMemConfig(max_objects=2, mem_slots=3, top_k=8)
    params = xmem.convert_xmem_checkpoint(tm.state_dict(), cfg)
    return tm, params, cfg


def _nhwc(t):
    return np.asarray(t.detach().permute(0, 2, 3, 1).numpy())


def test_memory_read_parity():
    """read_memory vs the torch XMem formulation on random tensors."""
    g = torch.Generator().manual_seed(1)
    M, N, Ck, O, Cv, K = 96, 32, 64, 3, 16, 12
    mk = torch.randn(M, Ck, generator=g)
    ms = torch.rand(M, generator=g) + 1.0
    qk = torch.randn(N, Ck, generator=g)
    qe = torch.sigmoid(torch.randn(N, Ck, generator=g))
    mv = torch.randn(M, O, Cv, generator=g)
    ref = torch_read_memory(mk, ms, qk, qe, mv, K)
    out = xmem.read_memory(
        jnp.asarray(mk.numpy()), jnp.asarray(ms.numpy()),
        jnp.asarray(mv.numpy()), jnp.ones((M,), bool),
        jnp.asarray(qk.numpy()), jnp.asarray(qe.numpy()), K,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5
    )


def test_encode_key_parity(models):
    tm, params, _ = models
    rng = np.random.default_rng(0)
    frame = rng.random((64, 64, 3), np.float32)
    f16, f8, f4, key, shr, sel = xmem.encode_key(
        params, jnp.asarray(frame)
    )
    timg = torch.from_numpy(
        ((frame - xmem.IMAGENET_MEAN) / xmem.IMAGENET_STD)
        .transpose(2, 0, 1)[None].copy()
    )
    with torch.no_grad():
        tf4, tf8, tf16 = tm.key_encoder(timg)
        tkey, tshr, tsel = tm.key_proj(tf16)
    np.testing.assert_allclose(np.asarray(f16), _nhwc(tf16)[0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(key), _nhwc(tkey)[0],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(shr), tshr[0, 0].numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sel), _nhwc(tsel)[0],
                               rtol=1e-3, atol=1e-4)


def test_encode_value_parity(models):
    tm, params, _ = models
    rng = np.random.default_rng(1)
    frame = rng.random((64, 64, 3), np.float32)
    masks = (rng.random((2, 64, 64)) > 0.7).astype(np.float32)
    hidden = rng.standard_normal((2, 4, 4, 64)).astype(np.float32) * 0.1

    f16, *_ = xmem.encode_key(params, jnp.asarray(frame))
    val, new_h = xmem.encode_value(
        params, jnp.asarray(frame), f16, jnp.asarray(hidden),
        jnp.asarray(masks), deep_update=True,
    )

    timg = torch.from_numpy(
        ((frame - xmem.IMAGENET_MEAN) / xmem.IMAGENET_STD)
        .transpose(2, 0, 1)[None].copy()
    )
    tmasks = torch.from_numpy(masks)
    tothers = torch.clamp(tmasks.sum(0, keepdim=True) - tmasks, 0, 1)
    th = torch.from_numpy(hidden.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        _, _, tf16 = tm.key_encoder(timg)
        tval, tnh = tm.value_encoder(timg, tf16, th, tmasks, tothers)
    np.testing.assert_allclose(np.asarray(val), _nhwc(tval),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_h), _nhwc(tnh),
                               rtol=1e-3, atol=1e-4)


def test_decode_parity(models):
    tm, params, _ = models
    rng = np.random.default_rng(2)
    frame = rng.random((64, 64, 3), np.float32)
    readout = rng.standard_normal((2, 4, 4, 512)).astype(np.float32) * 0.3
    hidden = rng.standard_normal((2, 4, 4, 64)).astype(np.float32) * 0.1

    f16, f8, f4, *_ = xmem.encode_key(params, jnp.asarray(frame))
    logits, new_h = xmem.decode(
        params, f16, f8, f4, jnp.asarray(hidden), jnp.asarray(readout)
    )

    timg = torch.from_numpy(
        ((frame - xmem.IMAGENET_MEAN) / xmem.IMAGENET_STD)
        .transpose(2, 0, 1)[None].copy()
    )
    with torch.no_grad():
        tf4, tf8, tf16 = tm.key_encoder(timg)
        tlog, tnh = tm.decoder(
            tf16, tf8, tf4,
            torch.from_numpy(hidden.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(readout.transpose(0, 3, 1, 2).copy()),
        )
    np.testing.assert_allclose(np.asarray(logits), tlog.numpy(),
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(new_h), _nhwc(tnh),
                               rtol=1e-3, atol=2e-4)


def test_session_mechanics(models):
    """Ring buffer advances, probabilities are valid, shapes static."""
    from video_llava_tpu.grounding.memory_tracker import LearnedMemoryTracker

    _, params, cfg = models
    tracker = LearnedMemoryTracker(params, cfg)
    rng = np.random.default_rng(3)
    frame = rng.random((60, 60, 3), np.float32)  # padded to 64x64
    mask = np.zeros((1, 60, 60), np.float32)
    mask[0, 10:30, 10:30] = 1
    tracker.add_reference(frame, mask)
    assert tracker.num_objects == 1
    assert int(tracker.state.next_slot) == 1
    for i in range(3):
        out = tracker.step(rng.random((60, 60, 3), np.float32))
        assert out.shape == (cfg.max_objects, 60, 60)
        assert np.isfinite(out).all()
        assert (out >= 0).all() and (out <= 1).all()
    # mem_every=5: frames 1..3 after the reference -> one write at idx 5
    assert int(tracker.state.next_slot) >= 1


def _shape_cue_sequence():
    """Frames where appearance changes and a same-color distractor sits
    near the object's OLD position: position+color features must fail,
    shape (circle vs square) disambiguates."""
    H = W = 64

    def frame_and_mask(circle_xy, circle_color, square_xy, square_color):
        img = np.full((H, W, 3), 0.15, np.float32)
        yy, xx = np.mgrid[:H, :W]
        cy, cx = circle_xy
        circ = (yy - cy) ** 2 + (xx - cx) ** 2 <= 8**2
        img[circ] = circle_color
        sy, sx = square_xy
        img[sy - 7 : sy + 7, sx - 7 : sx + 7] = square_color
        return img, circ.astype(np.float32)

    blue, green = (0.1, 0.2, 0.9), (0.1, 0.9, 0.2)
    # frame 0: blue circle at (16,16); square far away, green.
    f0, m0 = frame_and_mask((16, 16), blue, (48, 48), green)
    # frame 1: circle moved to (40, 40) and recolored GREEN->? circle is
    # now green; a BLUE square appears near the old circle position.
    f1, m1 = frame_and_mask((40, 40), green, (20, 20), blue)
    return (f0, m0), (f1, m1)


def _iou(a, b):
    inter = np.logical_and(a > 0.5, b > 0.5).sum()
    union = np.logical_or(a > 0.5, b > 0.5).sum()
    return inter / max(union, 1)


def test_handcrafted_features_fail_shape_cue():
    from video_llava_tpu.grounding.memory_tracker import (
        MemoryTracker, TrackerConfig,
    )

    (f0, m0), (f1, m1) = _shape_cue_sequence()
    tracker = MemoryTracker(TrackerConfig(max_objects=2))
    tracker.add_reference(f0, m0[None])
    pred = tracker.step(f1, update_memory=False)[0]
    assert _iou(pred, m1) < 0.3, (
        "handcrafted color+position features unexpectedly solved the "
        "appearance-change problem"
    )


@pytest.mark.slow
def test_trained_xmem_solves_shape_cue(models):
    """A few Adam steps on the pair teach the propagation net the shape
    cue; the handcrafted tracker above cannot fit it at all. Uses the
    full differentiable pipeline: encode_key -> read -> decode."""
    import optax

    _, params0, cfg = models
    (f0, m0), (f1, m1) = _shape_cue_sequence()
    f0j, f1j = jnp.asarray(f0), jnp.asarray(f1)
    masks0 = jnp.zeros((cfg.max_objects, 64, 64)).at[0].set(jnp.asarray(m0))
    target = jnp.asarray(m1)

    def predict(params):
        state = xmem.init_state(cfg, 4, 4)
        state = xmem.add_reference_step(
            params, state, f0j, masks0, jnp.int32(1), cfg
        )
        prob, _ = xmem.propagate_step(params, state, f1j, cfg)
        return prob[0]

    def loss_fn(params):
        p = jnp.clip(predict(params), 1e-6, 1 - 1e-6)
        bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
        return jnp.mean(bce)

    tx = optax.adam(1e-4)
    opt_state = tx.init(params0)
    params = params0

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(60):
        params, opt_state, loss = train_step(params, opt_state)
        losses.append(float(loss))
        if i >= 10 and _iou(np.asarray(predict(params)), m1) > 0.6:
            break
    final_iou = _iou(np.asarray(predict(params)), m1)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert final_iou > 0.6, (
        f"trained propagation failed the shape-cue problem: iou={final_iou}"
        f" losses={losses[:3]}...{losses[-3:]}"
    )


def test_reference_slot_never_evicted():
    """Slot 0 (the reference frame's memory) survives arbitrarily many
    later writes; the ring covers only slots 1..S-1."""
    import numpy as np

    from video_llava_tpu.models.xmem import XMemConfig, _write, init_state

    cfg = XMemConfig(mem_slots=4, key_dim=8, value_dim=8, hidden_dim=4,
                     max_objects=2)
    st = init_state(cfg, 2, 2)
    n = 4
    mk = lambda i: (  # noqa: E731
        jnp.full((n, cfg.key_dim), float(i)),
        jnp.ones((n,)),
        jnp.full((n, cfg.max_objects, cfg.value_dim), float(i)),
    )
    for i in range(10):
        st = _write(st, *mk(i))
    np.testing.assert_array_equal(np.asarray(st.keys[0]), 0.0)  # ref kept
    # ring slots hold the LAST writes, not early ones
    ring = sorted(float(np.asarray(st.keys[s, 0, 0])) for s in (1, 2, 3))
    assert ring == [7.0, 8.0, 9.0]
    assert bool(np.asarray(st.slot_valid).all())


def test_propagate_chunk_matches_sequential_steps(models):
    """step_chunk (batched key encode + on-device scan, incl. a
    mem_every write and pad frames inside the chunk) reproduces the
    per-frame step() chain: same outputs, same final state."""
    from video_llava_tpu.grounding.memory_tracker import LearnedMemoryTracker

    _, params, cfg = models
    rng = np.random.default_rng(7)
    ref_frame = rng.random((60, 60, 3), np.float32)
    mask = np.zeros((1, 60, 60), np.float32)
    mask[0, 10:30, 10:30] = 1
    frames = [rng.random((60, 60, 3), np.float32) for _ in range(6)]

    seq = LearnedMemoryTracker(params, cfg)
    seq.add_reference(ref_frame, mask)
    want = [seq.step(f) for f in frames]  # idx 1..6: write at idx 5

    chk = LearnedMemoryTracker(params, cfg)
    chk.add_reference(ref_frame, mask)
    got = list(chk.step_chunk(frames[:3]))
    got += list(chk.step_chunk(frames[3:], pad_to=5))  # 3 valid + 2 pad

    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-5)
    assert chk._frame_idx == seq._frame_idx
    assert int(chk.state.next_slot) == int(seq.state.next_slot)
    np.testing.assert_allclose(
        np.asarray(chk.state.hidden), np.asarray(seq.state.hidden),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(chk.state.keys), np.asarray(seq.state.keys),
        rtol=2e-4, atol=2e-5,
    )


def test_grounded_tracker_chunked_propagation_parity(models):
    """GroundedTracker's online gap-chunking (one device program per
    inter-detection gap) matches the per-frame process_frame path."""
    from video_llava_tpu.grounding.memory_tracker import LearnedMemoryTracker
    from video_llava_tpu.grounding.tracker import GroundedTracker, TrackerConfig

    _, params, cfg = models
    rng = np.random.default_rng(11)
    frames = []
    for t in range(7):
        img = np.full((48, 48, 3), 40, np.uint8)
        x = 8 + 4 * t
        img[10:30, x : x + 12] = (220, 40, 40)
        frames.append(img)

    def detector(image, prompts):
        red = (image[..., 0] > 150) & (image[..., 1] < 100)
        ys, xs = np.nonzero(red)
        box = np.array(
            [[xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]], np.float32
        )
        return box, np.array([0.9], np.float32), np.array([0], np.int64)

    def segmenter(image, boxes):
        out = np.zeros((len(boxes),) + image.shape[:2], np.float32)
        for i, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
            out[i, y0:y1, x0:x1] = 1.0
        return out

    kw = dict(
        detector=detector, segmenter=segmenter, detection_every=3,
        tracker_cfg=TrackerConfig(max_objects=cfg.max_objects),
    )
    chunked = GroundedTracker(
        propagator=LearnedMemoryTracker(params, cfg), **kw
    )
    got = chunked.run_host_loop(frames, ["red box"])

    class _NoChunk:
        """Same learned propagator, step_chunk hidden -> per-frame path."""

        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            if name == "step_chunk":
                raise AttributeError(name)
            return getattr(self._inner, name)

        @property
        def state(self):
            return self._inner.state

    perframe = GroundedTracker(
        propagator=_NoChunk(LearnedMemoryTracker(params, cfg)), **kw
    )
    want = perframe.run_host_loop(frames, ["red box"])

    assert len(got) == len(want) == len(frames)
    for a, b in zip(want, got):
        assert a.frame_index == b.frame_index
        np.testing.assert_allclose(b.masks, a.masks, rtol=2e-4, atol=2e-5)
        assert a.objects == b.objects


# -- long-term prototype memory (XMemConfig.lt_slots) --------------------------


def test_lt_consolidation_on_eviction():
    """When the ring overwrites an occupied slot, its lt_prototypes
    highest-usage elements move to the long-term ring; the usage row
    resets with the overwrite."""
    from video_llava_tpu.models.xmem import XMemConfig, _write, init_state

    cfg = XMemConfig(mem_slots=3, key_dim=8, value_dim=8, hidden_dim=4,
                     max_objects=2, lt_slots=8, lt_prototypes=2)
    st = init_state(cfg, 2, 2)  # n = 4 elements per slot
    n = 4
    mk = lambda i: (  # noqa: E731
        jnp.full((n, cfg.key_dim), float(i)),
        jnp.ones((n,)),
        jnp.full((n, cfg.max_objects, cfg.value_dim), float(i)),
    )
    for i in range(3):  # slot 0 (permanent ref), slots 1, 2
        st = _write(st, *mk(i), cfg)
    assert not bool(np.asarray(st.lt_valid).any())
    # elements 1 and 3 of slot 1 are the most-read
    st = st._replace(usage=st.usage.at[1, 1].set(5.0).at[1, 3].set(3.0))
    st = _write(st, *mk(3), cfg)  # ring wraps onto slot 1 -> consolidate
    lt_valid = np.asarray(st.lt_valid)
    assert lt_valid[:2].all() and not lt_valid[2:].any()
    # the consolidated elements carry slot 1's content (the "1" write)
    np.testing.assert_array_equal(np.asarray(st.lt_keys[:2]), 1.0)
    np.testing.assert_array_equal(np.asarray(st.lt_values[:2]), 1.0)
    assert int(st.lt_next) == 2
    np.testing.assert_array_equal(np.asarray(st.usage[1]), 0.0)
    # an invalid (never-written) slot does NOT consolidate: first fill
    # rounds above produced no LT entries (asserted before the wrap)


def test_lt_elements_attend_in_reads():
    """Reads attend over ring + LT jointly: a query matching only an LT
    key reads back the LT value even when the ring holds no match."""
    from video_llava_tpu.models.xmem import (
        XMemConfig, _memory_views, init_state, read_memory,
    )

    cfg = XMemConfig(mem_slots=2, key_dim=4, value_dim=4, hidden_dim=4,
                     max_objects=1, lt_slots=4, top_k=2)
    st = init_state(cfg, 1, 2)  # n = 2
    st = st._replace(
        keys=jnp.full_like(st.keys, 10.0),  # far from the query
        slot_valid=jnp.asarray([True, True]),
        lt_keys=st.lt_keys.at[0].set(1.0),  # exact query match
        lt_values=st.lt_values.at[0].set(7.0),
        lt_valid=st.lt_valid.at[0].set(True),
    )
    q = jnp.ones((2, cfg.key_dim))
    mk, ms, mv, valid = _memory_views(st, cfg, 2)
    out = read_memory(mk, ms, mv, valid, q, q, cfg.top_k)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-3)


def test_lt_long_session_tracks_and_stays_finite(models):
    """A session long enough to wrap the ring several times with LT on:
    prototypes consolidate, probabilities stay valid, and the step keeps
    its static shapes (one compile)."""
    import dataclasses as dc

    _, params, base_cfg = models
    cfg = dc.replace(base_cfg, mem_slots=3, lt_slots=16, lt_prototypes=4)
    rng = np.random.default_rng(7)
    frame = rng.random((64, 64, 3), np.float32)
    mask = np.zeros((1, 64, 64), np.float32)
    mask[0, 10:30, 10:30] = 1

    state = xmem.init_state(cfg, 4, 4)
    state = xmem.add_reference_step(
        params, state, jnp.asarray(frame),
        jnp.pad(mask, ((0, cfg.max_objects - 1), (0, 0), (0, 0))),
        jnp.int32(1), cfg,
    )
    for i in range(6):  # writes every frame: wraps the 3-slot ring
        prob, state = xmem.propagate_step(
            params, state, jnp.asarray(rng.random((64, 64, 3), np.float32)),
            cfg, update_memory=True, deep_update=False,
        )
        assert np.isfinite(np.asarray(prob)).all()
    assert bool(np.asarray(state.lt_valid).any())  # consolidation fired
    assert float(np.asarray(state.usage).sum()) >= 0.0
    # reference slot still intact (slot 0 permanent)
    assert bool(np.asarray(state.slot_valid[0]))
