"""GPipe-style pipeline parallelism over a ``pp`` mesh axis (training).

The reference scales training with FSDP only (xllmx/solvers/finetune/
finetune.py); SURVEY.md §2.7 lists pipeline parallelism as the remaining
strategy for multi-slice scaling, where a stage boundary over DCN beats
fully-sharded weights.  TPU-native design:

- The layer stack is split into ``pp`` consecutive stages; each device along
  the ``pp`` axis holds its stage's ``[L/pp, ...]`` slice of the stacked
  layer weights (a leading-axis shard — no resharding of individual kernels).
- The forward is one ``shard_map`` program: microbatches enter stage 0, and a
  ``lax.scan`` over ``n_micro + pp - 1`` ticks applies each stage's layer
  block and rotates activations to the next stage with ``lax.ppermute``.
- The backward pipeline is NOT hand-written: ``jax.grad`` differentiates
  through ``ppermute`` (transpose = reverse permutation), so the same scan
  yields the reverse-order bubble schedule automatically.
- Embedding / final norm / lm_head stay replicated: stage 0 embeds, the last
  stage computes the loss, and a ``psum`` over ``pp`` hands every stage the
  scalar (gradients for non-resident stages' layer slices are zero by
  construction of the masked selects).

Composability: the ``pp`` axis is orthogonal to ``dp`` — build the mesh as
``(dp, pp)`` and shard the batch over ``dp`` as usual.  Within a stage,
tensor-parallel column/row sharding (mesh.base_param_specs) can be layered on
a third axis by the caller; this module only moves activations along ``pp``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ModelConfig
from ..models import transformer as tfm

PP = "pp"


def split_stages(layers: dict, pp: int) -> dict:
    """Reshape layer-stacked weights [L, ...] -> [pp, L/pp, ...] so the
    leading axis shards one stage per device along ``pp``."""
    def f(a):
        L = a.shape[0]
        if L % pp:
            raise ValueError(f"num_layers {L} not divisible by pp={pp}")
        return a.reshape(pp, L // pp, *a.shape[1:])
    return jax.tree.map(f, layers)


def merge_stages(staged: dict) -> dict:
    """Inverse of ``split_stages``."""
    return jax.tree.map(lambda a: a.reshape(-1, *a.shape[2:]), staged)


def stage_specs(staged: dict) -> dict:
    """PartitionSpecs sharding the leading stage axis over ``pp``."""
    return jax.tree.map(lambda a: P(PP, *([None] * (a.ndim - 1))), staged)


def pipeline_loss_fn(
    cfg: ModelConfig,
    mesh: Mesh,
    n_micro: int,
    rope,
    remat: bool = True,
):
    """Build ``loss(params_nonstage, staged_layers, batch) -> (loss, acc)``
    running the decoder as a ``pp``-stage GPipe pipeline under shard_map.

    ``staged_layers``: ``split_stages(params["layers"], pp)`` sharded with
    ``stage_specs`` over ``mesh``.  ``batch``: tokens [B, T] (+ loss_mask,
    optional attn_valid); B must divide into ``n_micro`` microbatches.
    Semantics match train/finetune.token_loss (next-token CE).
    """
    pp = mesh.shape[PP]
    # every non-pp mesh axis is a data axis: the batch shards over them and
    # the masked loss sums reduce over (pp, *data) so dp composes for real
    data_axes = tuple(a for a in mesh.axis_names if a != PP)
    cos, _ = rope

    def stage_apply(layers_stage, x, positions, mask, stage):
        # global layer offset = stage * (L/pp); layer 0's no-input-norm
        # special case stays correct because idx0 == 0 only on stage 0
        Ls = jax.tree.leaves(layers_stage)[0].shape[0]
        return tfm.train_layer_block(
            layers_stage, cfg, x, positions, rope, mask,
            idx0=stage * Ls, remat=remat,
        )

    def spmd(params, staged, tokens, loss_mask, attn_valid):
        # staged leaves arrive as [1, L/pp, ...] on each device; drop lead
        layers_stage = jax.tree.map(lambda a: a[0], staged)
        stage = jax.lax.axis_index(PP)
        B, T = tokens.shape
        mb = B // n_micro

        embeds = tfm.token_embed(params, tokens)
        positions = jnp.clip(jnp.arange(T), 0, cos.shape[0] - 1)[None, :]
        mask_all = tfm.train_mask(T, attn_valid)                 # [B or 1,1,T,T]
        has_pad = mask_all.shape[0] != 1

        x_mb = embeds.reshape(n_micro, mb, T, -1)
        if has_pad:
            m_mb = mask_all.reshape(n_micro, mb, 1, T, T)
        else:
            m_mb = jnp.broadcast_to(mask_all[None], (n_micro, *mask_all.shape))

        n_ticks = n_micro + pp - 1
        carry0 = jnp.zeros((mb, T, embeds.shape[-1]), embeds.dtype)
        outs0 = jnp.zeros((n_micro, mb, T, embeds.shape[-1]), embeds.dtype)
        # mark the zero-init carries as device-varying over pp AND the data
        # axes (their updates are, now that the batch shards over dp), or
        # the scan carry types disagree under shard_map
        vary = (PP,) + data_axes
        carry0 = jax.lax.pcast(carry0, vary, to="varying")
        outs0 = jax.lax.pcast(outs0, vary, to="varying")

        def tick(state, t):
            carry, outs = state
            feed = x_mb[jnp.clip(t, 0, n_micro - 1)]
            x = jnp.where(stage == 0, feed, carry)
            m = m_mb[jnp.clip(t - stage, 0, n_micro - 1)]
            y = stage_apply(layers_stage, x, positions, m, stage)
            out_slot = t - (pp - 1)
            is_out = (stage == pp - 1) & (out_slot >= 0)
            outs = jnp.where(
                is_out,
                jax.lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(out_slot, 0), axis=0),
                outs,
            )
            carry = jax.lax.ppermute(
                y, PP, [(i, (i + 1) % pp) for i in range(pp)]
            )
            return (carry, outs), None

        (_, outs), _ = jax.lax.scan(tick, (carry0, outs0), jnp.arange(n_ticks))

        hidden = outs.reshape(B, T, -1)
        if cfg.final_norm:
            hidden = tfm.rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
        logits = tfm.logits_head(params, hidden)                 # [B, T, V]
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = tokens[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        m = loss_mask[:, 1:]
        # only the last stage holds real outputs; sum-based reduction over
        # (pp, *data) makes dp shards combine exactly (per-shard means
        # would mis-weight uneven mask counts), and the cotangent of the
        # masked psum routes straight back to the last stage
        last_only = (stage == pp - 1).astype(nll.dtype)
        axes = (PP,) + data_axes
        nll_sum = jax.lax.psum(jnp.sum(nll * m) * last_only, axes)
        hit_sum = jax.lax.psum(
            jnp.sum((jnp.argmax(logits[:, :-1], -1) == tgt) * m) * last_only,
            axes)
        m_sum = jax.lax.psum(jnp.sum(m) * last_only, axes)
        return nll_sum / (m_sum + 1e-6), hit_sum / (m_sum + 1e-6)

    bspec = P(data_axes if data_axes else None)

    def smapped(av_spec):
        return jax.shard_map(
            spmd, mesh=mesh,
            in_specs=(P(), stage_specs_like_ones(), bspec, bspec, av_spec),
            out_specs=(P(), P()),
        )

    run_shared_av = smapped(P())       # attn_valid [1, T], replicated
    run_padded_av = smapped(bspec)     # attn_valid [B, T], batch-sharded

    def loss_fn(params, staged, batch):
        if "cond" in batch:
            raise NotImplementedError(
                "conditional (cond-prefix) batches are not supported by the "
                "pipeline trainer yet; use finetune.train_step")
        attn_valid = batch.get("attn_valid")
        if attn_valid is None:
            # shared [1, T] mask: train_mask then broadcasts one [1,1,T,T]
            # causal mask instead of materializing [B,1,T,T]
            attn_valid = jnp.ones((1, batch["tokens"].shape[1]), jnp.float32)
        run = run_shared_av if attn_valid.shape[0] == 1 else run_padded_av
        return run(params, staged, batch["tokens"],
                   batch["loss_mask"], attn_valid)

    return loss_fn


def stage_specs_like_ones():
    """in_spec pytree prefix for the staged layers: shard axis 0 over pp."""
    # shard_map accepts a PartitionSpec as a pytree *prefix*; one spec covers
    # every staged leaf
    return P(PP)


def make_train_step(cfg, mesh: Mesh, n_micro: int, rope, fcfg=None):
    """Jitted AdamW train step over (params, staged_layers) with the
    pipeline loss — the pp-parallel counterpart of finetune.train_step.
    Returns ``(step_fn, init_fn)``; optimizer state lives alongside each
    param group (staged slices keep their pp sharding through optax's
    elementwise updates)."""
    import optax

    from ..train import finetune as ft

    fcfg = fcfg or ft.FinetuneConfig()
    loss_fn = pipeline_loss_fn(cfg, mesh, n_micro, rope, remat=fcfg.remat)
    # same optimizer as the single-device trainer — including the decay
    # mask (no weight decay on norms/biases/embeddings); rebuilding adamw
    # here without it silently decayed them
    opt = ft.build_optimizer(fcfg)

    def init_fn(params, staged):
        return opt.init((params, staged))

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, staged, opt_state, batch):
        def lf(p, s):
            return loss_fn(p, s, batch)

        (loss, acc), grads = jax.value_and_grad(
            lambda ps: lf(*ps), has_aux=True)((params, staged))
        updates, opt_state = opt.update(grads, opt_state, (params, staged))
        params, staged = optax.apply_updates((params, staged), updates)
        return params, staged, opt_state, {"loss": loss, "acc": acc}

    return step_fn, init_fn
