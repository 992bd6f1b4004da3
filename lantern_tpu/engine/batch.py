"""Batched speculative decoding: R concurrent requests in one program.

Single-request decode is weight-streaming-bound (every verify step reads all
base weights once); batching R requests amortizes that read R ways — the
tokens/s/chip multiplier the reference gets from vLLM (SURVEY.md §2.7).

Design:
- The per-request speculative step (engine/spec.py) is ``jax.vmap``-ed over a
  leading request axis: per-request KV caches, lengths, drafter state, PRNG
  keys, and token buffers stack; parameters broadcast via closure.  CFG stays
  the *inner* cond/uncond pair of each request.
- The decode loop is host-driven (one jitted batched step per call) so the
  scheduler can swap finished slots for freshly prefilled requests between
  steps — continuous batching with fully static shapes.
- Finished slots freeze: the step result is masked back to the old state, so
  a slot's outputs stay stable until the scheduler drains it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import DrafterConfig, ModelConfig
from ..models import transformer as tfm
from ..trees import TreeSpec
from . import spec as spec_engine
from .spec import SpecDecodeConfig, SpecState, TokenPrompt, _Ctx


@dataclasses.dataclass
class BatchedEngine:
    """R-slot continuous-batching speculative decoder (single chip or mesh).

    ``mesh`` composes serving with the (dp, tp) device mesh: slots (requests)
    shard over ``dp``, base params/KV over ``tp`` (shard them with
    ``parallel.mesh.shard_pytree`` before constructing the engine), drafter
    replicated — the TPU counterpart of the reference's vLLM-with-TP serving
    (third_party/vllm/vllm/model_executor/models/chameleon.py:222-322).
    ``num_slots`` must be a multiple of the mesh's dp size."""

    ecfg: SpecDecodeConfig
    cfg: ModelConfig
    dcfg: DrafterConfig
    tree: Optional[TreeSpec]
    params: dict
    dparams: dict
    num_slots: int
    logits_mask: Optional[jnp.ndarray] = None
    logits_fn: object = None
    mesh: object = None

    def __post_init__(self):
        ecfg, cfg, dcfg, tree = self.ecfg, self.cfg, self.dcfg, self.tree
        if ecfg.deferred_commit:
            # per-slot carried tree blocks + extra_kv writes under vmap are
            # unsupported (and the rollback kernel already batches); the
            # single-request engine is where the deferred path pays off
            raise ValueError("deferred_commit is unsupported in BatchedEngine")
        rope = tfm.make_rope_tables(cfg)
        drope = tfm.make_rope_tables(dcfg.model)
        logits_mask, logits_fn = self.logits_mask, self.logits_fn

        # params/dparams must be jit ARGUMENTS, not closure captures: captured
        # arrays are lowered as inline dense constants, and a full model's
        # weights blow the HLO up to gigabytes (which also kills remote-compile
        # tunnels); as arguments they lower as parameters
        def one_step(params, dparams, state: SpecState, prefix_valid,
                     pos_offsets):
            ctx = _Ctx(params=params, dparams=dparams, rope=rope, drope=drope,
                       nearest=params.get("nearest_latents"),
                       prefix_valid=prefix_valid,
                       # drafter pad masking is a Chameleon-family behavior
                       # (token prompts, cond_kind "none"); the LlamaGen
                       # drafter attends pads like the reference's
                       drafter_pv=(prefix_valid if cfg.cond_kind == "none"
                                   else None),
                       pos_offsets=pos_offsets, logits_mask=logits_mask,
                       # per-slot grid start (ragged Lumina prompt lengths):
                       # the slot's uncond offset IS its image-start index
                       logits_fn=spec_engine.bind_logits_fn(logits_fn,
                                                            pos_offsets))
            if ecfg.mode == "static":
                f = spec_engine.make_static_step(ecfg, cfg, dcfg, tree, ctx)
            else:
                f = spec_engine.make_dynamic_step(ecfg, cfg, dcfg, ctx)
            active = (state.n_new < ecfg.max_new) & ~state.stopped
            new_state = f(state)

            # Freeze finished slots — but ONLY the cheap leaves.  A tree-wide
            # select would copy the multi-GB KV buffers every step; instead the
            # KV *lengths* freeze (so a finished slot's committed prefix is
            # never touched: steps only write provisional rows at/past length,
            # which attention masks out) while the buffers themselves stay
            # donated scribble space until the scheduler drains the slot.
            # The selects are built leaf-by-leaf so the giant-buffer selects
            # never exist in the graph (not even as DCE fodder).
            def sel(a, b):
                return jnp.where(active, b, a)

            return new_state._replace(
                draft=jax.tree.map(sel, state.draft, new_state.draft),
                root_token=sel(state.root_token, new_state.root_token),
                tokens=sel(state.tokens, new_state.tokens),
                n_new=sel(state.n_new, new_state.n_new),
                steps=sel(state.steps, new_state.steps),
                accept_sum=sel(state.accept_sum, new_state.accept_sum),
                rng=sel(state.rng, new_state.rng),
                stopped=sel(state.stopped, new_state.stopped),
                base_kv=dataclasses.replace(
                    new_state.base_kv,
                    length=sel(state.base_kv.length, new_state.base_kv.length)),
                draft_kv=dataclasses.replace(
                    new_state.draft_kv,
                    length=sel(state.draft_kv.length, new_state.draft_kv.length)),
            )

        # donate the batch state: KV buffers update in place instead of
        # allocating + copying fresh outputs every step
        vstep = jax.vmap(one_step, in_axes=(None, None, 0, 0, 0))
        self._batched_step = jax.jit(vstep, donate_argnums=(2,))

        # fused multi-step: one dispatch per n steps.  Host-driven per-step
        # dispatch costs ~5-10 ms of pytree arg processing per call (plus
        # full round trips on remote-TPU links); a lax.scan amortizes it and
        # lets the scheduler poll slot status at a coarser cadence.
        from functools import partial as _partial

        @_partial(jax.jit, static_argnums=(5,), donate_argnums=(2,))
        def step_many_fn(params, dparams, bstate, bpv, boffs, n):
            def body(st, _):
                return vstep(params, dparams, st, bpv, boffs), None
            st, _ = jax.lax.scan(body, bstate, None, length=n)
            return st

        self._batched_step_many = step_many_fn
        self._insert = jax.jit(self._insert_impl, donate_argnums=(0,))

        # prefill must be jitted: run eagerly it dispatches hundreds of ops
        # one-by-one (pathological over a remote-TPU tunnel)
        def prefill_fn(params, dparams, cond, uncond, rng, prefix_valid,
                       token_prompt):
            return spec_engine.prefill_request(
                params, dparams, ecfg, cfg, dcfg, tree, cond, uncond, rng,
                prefix_valid=prefix_valid, token_prompt=token_prompt,
                logits_mask=logits_mask, logits_fn=logits_fn,
            )

        self._prefill_jit = jax.jit(prefill_fn)

    # ------------------------------------------------------------------
    def prefill(self, cond, uncond, rng, token_prompt: Optional[TokenPrompt] = None,
                prefix_valid=None):
        """Prefill one request -> (SpecState, prefix_valid, pos_offsets)."""
        return self._prefill_jit(self.params, self.dparams, cond, uncond,
                                 rng, prefix_valid, token_prompt)

    def empty_batch(self, proto):
        """Replicate a prototype request R times, marked finished (n_new past
        max) so steps are no-ops until slots are filled.  With a ``mesh``,
        the batch lands dp-sharded over slots (KV head groups over tp where
        divisible); later steps/inserts preserve the placement."""
        state, pv, offs = proto
        R = self.num_slots
        bstate = jax.tree.map(lambda a: jnp.broadcast_to(a, (R,) + a.shape), state)
        bstate = bstate._replace(n_new=jnp.full((R,), 1 << 30, jnp.int32))
        batch = (
            bstate,
            jnp.broadcast_to(pv, (R,) + pv.shape),
            jnp.broadcast_to(offs, (R,) + offs.shape),
        )
        if self.mesh is not None:
            batch = jax.device_put(batch, self._batch_shardings(batch))
        return batch

    def _batch_shardings(self, batch):
        """Sharding tree for the batch state: slot axis over dp; the base
        KV's head-group axis (and its int8 scale planes) over tp."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DP, TP

        mesh = self.mesh
        if self.num_slots % mesh.shape[DP]:
            raise ValueError(
                f"num_slots {self.num_slots} must be a multiple of the "
                f"mesh dp size {mesh.shape[DP]}")

        def slot_only(a):
            return NamedSharding(mesh, P(*([DP] + [None] * (a.ndim - 1))))

        bstate, bpv, boffs = batch
        sh = jax.tree.map(slot_only, batch)
        kv = bstate.base_kv
        G = kv.k.shape[3]                  # [R, L, B2, G, S, W]
        if G % mesh.shape[TP] == 0:
            buf = NamedSharding(mesh, P(DP, None, None, TP, None, None))
            scale = NamedSharding(mesh, P(DP, None, None, TP, None))
            kv_sh = sh[0].base_kv
            kv_sh = dataclasses.replace(
                kv_sh, k=buf, v=buf,
                k_scale=None if kv.k_scale is None else scale,
                v_scale=None if kv.v_scale is None else scale,
            )
            sh = (sh[0]._replace(base_kv=kv_sh), sh[1], sh[2])
        return sh

    @staticmethod
    def _insert_impl(batch, slot, request):
        bstate, bpv, boffs = batch
        state, pv, offs = request

        def put(b, s):
            return jax.lax.dynamic_update_slice(
                b, s[None].astype(b.dtype), (slot,) + (0,) * s.ndim
            )

        return (jax.tree.map(put, bstate, state), put(bpv, pv), put(boffs, offs))

    def insert(self, batch, slot, request):
        """Write a prefilled request into slot ``slot``."""
        return self._insert(batch, jnp.asarray(slot, jnp.int32), request)

    def step(self, batch):
        bstate, bpv, boffs = batch
        return (self._batched_step(self.params, self.dparams, bstate, bpv,
                                   boffs), bpv, boffs)

    def step_many(self, batch, n: int):
        """Run ``n`` batched steps in one fused dispatch (lax.scan)."""
        bstate, bpv, boffs = batch
        return (self._batched_step_many(self.params, self.dparams, bstate,
                                        bpv, boffs, n), bpv, boffs)

    # -- host-side convenience ------------------------------------------
    def slot_status(self, batch):
        """(n_new, steps, accept_sum) per slot as numpy — one device fetch
        (three separate np.asarray calls would pay three round trips on
        remote links).  With ``ecfg.stop_ids``, stopped slots report
        ``n_new`` as ``max_new`` so schedulers see them as done."""
        import numpy as np

        bstate = batch[0]
        n_new, steps, acc, stopped = jax.device_get(
            (bstate.n_new, bstate.steps, bstate.accept_sum, bstate.stopped))
        if self.ecfg.stop_ids:
            n_new = np.where(stopped, self.ecfg.max_new, n_new)
        return n_new, steps, acc

    def slot_tokens(self, batch, slot):
        """Slot's committed stream, truncated at the first stop id when
        ``ecfg.stop_ids`` is set."""
        import numpy as np

        toks = np.asarray(batch[0].tokens[slot][: self.ecfg.max_new])
        if self.ecfg.stop_ids:
            hit = np.isin(toks, np.asarray(self.ecfg.stop_ids))
            if hit.any():
                toks = toks[: int(np.argmax(hit)) + 1]
        return toks
