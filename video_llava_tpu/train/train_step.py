"""The sharded training step.

Reference semantics (video_chatgpt/train/train.py:477-562):
  * loss = shifted CE with IGNORE_INDEX masking over conversation
    labels, video features spliced into the prompt;
  * `tune_mm_mlp_adapter` freezes everything except the projector
    (and optionally the token embeddings) (:509-525);
  * DDP/FSDP over devices -> here: pjit over a ('data','model') mesh;
    gradients reduce over 'data' automatically via sharding propagation.

Trainability is expressed as an optax-style boolean mask pytree so the
optimizer state for frozen params is a lightweight placeholder.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from video_llava_tpu.config import VideoLLaVAConfig
from video_llava_tpu.models import video_llava


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def trainable_mask(params, mode: str = "projector+embed"):
    """Boolean pytree: True = trained.

    modes: 'projector' | 'projector+embed' (reference default when
    tune_mm_mlp_adapter, train.py:509-525) | 'full'.
    """
    flat = jax.tree_util.tree_map_with_path(
        lambda path, _: _is_trainable(path, mode), params
    )
    return flat


def _is_trainable(path, mode: str) -> bool:
    keys = "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )
    if mode == "full":
        return True
    if keys.startswith("projector"):
        return True
    if mode == "projector+embed" and "embed_tokens" in keys:
        return True
    return False


def make_optimizer(
    learning_rate: float = 2e-3,
    weight_decay: float = 0.0,
    warmup_steps: int = 100,
    total_steps: int = 10_000,
    mask=None,  # unused: the step runs the optimizer on the trainable
    # subtree only (None-placeholder pytree), so no masking wrapper and
    # no optimizer state for frozen params.
) -> optax.GradientTransformation:
    """AdamW + cosine schedule (the reference recipe uses HF Trainer's
    cosine with warmup_ratio 0.03, docs/2-Training.md:42-67)."""
    if warmup_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, max(total_steps, warmup_steps + 1)
        )
    else:
        schedule = optax.cosine_decay_schedule(learning_rate, max(total_steps, 1))
    return optax.adamw(schedule, weight_decay=weight_decay)


def loss_fn(params, cfg: VideoLLaVAConfig, batch) -> jax.Array:
    """batch: input_ids (b,s), labels (b,s), video_features
    (b, video_token_len, mm_hidden) raw pooled CLIP features (the
    reference trains on precomputed features, train.py:396-422)."""
    _, loss, _ = video_llava.forward(
        params,
        cfg,
        batch["input_ids"],
        batch.get("video_features"),
        labels=batch["labels"],
        remat=True,  # O(layers) activation memory for 7B/13B training
    )
    return loss


def _split_by_mask(params, mask):
    """-> (trainable, frozen) trees with None placeholders (so the
    structures recombine exactly)."""
    trainable = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return trainable, frozen


def _merge(trainable, frozen):
    return jax.tree.map(
        lambda t, f: t if f is None else f,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def make_train_step(
    cfg: VideoLLaVAConfig,
    tx: optax.GradientTransformation,
    mask=None,
    donate: bool = True,
    grad_accum: int = 1,
):
    """Returns jitted (state, batch) -> (state, metrics).

    With a trainability mask, only the trainable subtree is
    differentiated — at 7B scale, gradients for the frozen backbone
    would otherwise cost ~4 bytes/param of HBM for nothing (the
    reference relies on requires_grad=False for the same reason,
    train.py:509-518).

    grad_accum > 1 scans the batch in `grad_accum` microbatches
    (leading batch dim must divide) and takes ONE optimizer step on
    TOKEN-WEIGHTED averaged gradients: each microbatch's token-mean
    loss gradient is weighted by its valid-target count, so the result
    equals the full-batch gradient exactly (HF's
    gradient_accumulation_steps averages microbatches equally, which
    skews when sequence lengths vary). Accumulation is fp32.
    """
    from video_llava_tpu.constants import IGNORE_INDEX

    def step(state: TrainState, batch):
        if mask is None:
            trainable, frozen = state.params, None
            opt_target = state.params
        else:
            trainable, frozen = _split_by_mask(state.params, mask)
            opt_target = trainable

        def loss_of(tr, mb):
            p = tr if mask is None else _merge(tr, frozen)
            return loss_fn(p, cfg, mb)

        if grad_accum == 1:
            loss, grads = jax.value_and_grad(loss_of)(trainable, batch)
        else:
            def to_micro(x):
                b = x.shape[0]
                assert b % grad_accum == 0, (b, grad_accum)
                # STRIDED split (row j of microbatch a is global row
                # j*A + a): under a 'data'-sharded batch every
                # microbatch spans all data shards — a contiguous split
                # would hand each microbatch to one shard and serialize
                # the data parallelism.
                return x.reshape(
                    (b // grad_accum, grad_accum) + x.shape[1:]
                ).swapaxes(0, 1)

            micro_batches = jax.tree.map(to_micro, batch)
            zeros = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), opt_target
            )

            def micro(carry, mb):
                gacc, lsum, wsum = carry
                ntok = jnp.sum(
                    mb["labels"][:, 1:] != IGNORE_INDEX
                ).astype(jnp.float32)
                loss, grads = jax.value_and_grad(loss_of)(trainable, mb)
                gacc = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32) * ntok,
                    gacc, grads,
                )
                return (gacc, lsum + loss * ntok, wsum + ntok), None

            (gacc, lsum, wsum), _ = jax.lax.scan(
                micro, (zeros, jnp.float32(0), jnp.float32(0)),
                micro_batches,
            )
            w = jnp.maximum(wsum, 1.0)
            grads = jax.tree.map(
                lambda a, p: (a / w).astype(p.dtype), gacc, opt_target
            )
            loss = lsum / w

        updates, new_opt = tx.update(grads, state.opt_state, opt_target)
        new_target = optax.apply_updates(opt_target, updates)
        new_params = (
            new_target if mask is None else _merge(new_target, frozen)
        )
        gnorm = optax.global_norm(grads)
        return (
            TrainState(new_params, new_opt, state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_train_state(params, tx, mask=None) -> TrainState:
    """opt_state covers only the trainable subtree when a mask is given."""
    target = params if mask is None else _split_by_mask(params, mask)[0]
    return TrainState(
        params, jax.jit(tx.init)(target), jnp.zeros((), jnp.int32)
    )
