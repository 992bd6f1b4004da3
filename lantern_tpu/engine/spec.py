"""Speculative decode engine: draft -> tree-verify -> accept -> re-draft,
entirely on device.

This is the TPU re-design of the reference's EaModel.generate hot loop
(ea_model_llamagen.py:1001-1170).  Differences that matter for TPU:

- The whole step (candidate assembly, tree verification forward, acceptance
  rule, KV rollback, drafter re-expansion) is one jitted function with static
  shapes; the decode loop is a ``lax.while_loop`` — zero host syncs per step,
  vs the reference's per-step ``.item()`` / python rejection loops.
- Tree KV rows are written provisionally and compacted in place
  (kv.accept_path) instead of narrow+copy.
- The committed-token stream is a fixed [max_new + pad] buffer written with
  masked fixed-size blocks.

Currently single-request (CFG cond/uncond as the 2-row batch); request
batching composes via vmap/sharding at the session layer.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DrafterConfig, ModelConfig
from ..kv import KVCache
from ..trees import TreeSpec
from ..ops import acceptance as acc
from ..ops import quant
from ..ops.sampling import LogitsWarp, cfg_combine, sample_token
from ..models import drafter as drf
from ..models import transformer as tfm


@dataclasses.dataclass(frozen=True)
class SpecDecodeConfig:
    """Static engine config (hashable -> jit key)."""

    warp: LogitsWarp = LogitsWarp()
    cfg_scale: float = 4.0
    lantern: acc.LanternSpec = acc.LanternSpec()
    max_new: int = 256
    mode: str = "static"            # "static" (EAGLE-1) | "dynamic" (EAGLE-2)
    kv_quant: bool = False          # int8 base KV cache (kv.py quantized=True)
    # parity-test hook: pin every stochastic choice — acceptance coins become
    # this constant, drafter proposals become deterministic top-k, bonus/t0
    # sampling becomes argmax.  Lets golden tests token-match the reference's
    # do_sample=True path (whose greedy branch is NotImplemented for Lumina,
    # ea_model_lumina_mgpt.py:729) with random.random() mocked to the same
    # constant.  None = real sampling.
    pin: Optional[float] = None
    # separate drafter warp (reference drafter_top_k,
    # ea_model_lumina_mgpt.py:825-831: the drafter's logits processors get
    # their own top-k while the verifier keeps top_k).  None = share `warp`.
    drafter_warp: Optional[LogitsWarp] = None
    # Drafter-free stale-distribution drafting (static mode only): every tree
    # node proposes from the raw cfg-combined base distribution at the last
    # accepted node — bit-identical to ``draft_static`` with the hidden-
    # passthrough drafter (the measured-optimal drafter on a random-weight
    # base, PERF.md) but with ZERO drafter forwards and ZERO extra lm_head
    # matmuls per step (drf.draft_stale).  dparams become dead weight-side
    # inputs; the drafter KV shrinks to a stub.
    stale_draft: bool = False
    # Deferred KV commit (static mode): the tree block's roped K/V never hit
    # the cache — the engine carries them (SpecState.blk) and the NEXT
    # verification forward commits only the accepted rows, pre-scan, via
    # tfm.forward ``extra_kv``.  Replaces two stacked write kernels per step
    # (the N+1-row provisional write + the kv.accept_path rollback gather,
    # together ~1.4 ms/step at Lumina-7B geometry, worse for trees past 32
    # nodes where the int8 staging window doubles) with ONE path-length-row
    # write, at the cost of a carried [L, B, N+1, n_kv, hd] block (~27 MB
    # bf16 at 7B).  Bit-identical to the accept_path engine: committed
    # bytes, attention column order, and rng stream are all unchanged
    # (tests/test_deferred_commit.py asserts token-exact streams).
    deferred_commit: bool = False
    # Acceptance-walk warp mode (acc.stochastic_verify_tree batch_warp):
    # True warps all tree-node logit rows in one batched pass (kills the
    # serial per-visited-node warp chain — the measured win at Lumina's
    # [39, 65536]); False warps visited rows on demand; None keeps the
    # size heuristic.  Pinned per engine config so tree-size changes never
    # silently flip the mode (advisor r4).
    walk_batch_warp: Optional[bool] = None
    # EOS-terminated (variable-length / interleaved) generation: the decode
    # loop stops once any of these ids is COMMITTED, and SpecResult.n_valid
    # marks the stream end (stop id included).  This implements the intended
    # semantics of the reference solvers' eos_token_id — the base path's HF
    # generate honors it (inference_solver.py:441); the reference EAGLE
    # loop's own check (`eos_token_ids in input_ids[...].tolist()`,
    # ea_model_lumina_mgpt.py:1010-1011) tests list-in-list membership and
    # never fires, a reference bug we do not reproduce.
    stop_ids: Tuple[int, ...] = ()

    @property
    def dwarp(self) -> LogitsWarp:
        return self.drafter_warp if self.drafter_warp is not None else self.warp


class SpecState(NamedTuple):
    base_kv: KVCache
    draft_kv: KVCache
    draft: object                   # StaticDraft | DynamicDraft pytree
    root_token: jnp.ndarray         # [] sampled-but-unverified next token
    tokens: jnp.ndarray             # [max_new + pad] committed ids
    n_new: jnp.ndarray              # [] committed count
    steps: jnp.ndarray              # [] verify steps taken
    accept_sum: jnp.ndarray         # [] total accepted tokens (incl. roots)
    rng: jax.Array
    stopped: jnp.ndarray = np.zeros((), bool)  # [] a stop id was committed
    # deferred-commit carry (ecfg.deferred_commit; None otherwise):
    blk: object = None              # (k, v) [L, B, N+1, n_kv, hd] tree block
    psel: object = None             # [D] accepted slots into blk
    pn: object = None               # [] accepted count (rows to commit)
    # INVARIANT (deferred mode): between steps — including after the decode
    # while_loop exits — base_kv lags the committed token stream by ``pn``
    # rows; the lagging rows live in ``blk[psel[:pn]]`` and are committed by
    # the NEXT verification forward's extra_kv.  SpecResult.tokens is always
    # complete; any future consumer that resumes generation from a terminal
    # SpecState or reads base_kv directly must first flush the pending rows
    # (one kv.write(blk[psel]) + commit(pn)).


class SpecResult(NamedTuple):
    tokens: jnp.ndarray             # [max_new]
    steps: jnp.ndarray
    accept_sum: jnp.ndarray
    # committed stream length: max_new, or (with ecfg.stop_ids) the index
    # one past the first stop id — tokens past it are conditioned on the
    # stopped prefix exactly as a continued AR run would be, so truncation
    # here equals stopping at the stop token
    n_valid: jnp.ndarray = np.zeros((), np.int32)

    @property
    def step_compression(self):
        return self.accept_sum / jnp.maximum(self.steps, 1)


def _safe_gather_ext(vec_ext: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather with -1 indices mapped to the last (pad) slot of vec_ext."""
    n = vec_ext.shape[0] - 1
    return vec_ext[jnp.where(idx < 0, n, idx)]


def _mask_logits(logits: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return logits
    return jnp.where(mask, jnp.finfo(jnp.float32).min, logits)


def bind_logits_fn(logits_fn, pos_offsets):
    """Bind a per-request grid-start index into a position-indexed logits_fn.

    ``LuminaGridFSM.image_start_idx`` is a static field; engines whose
    requests may have different prompt lengths instead thread each request's
    uncond position offset (``pos_offsets[1]``, which ``lumina_token_prompt``
    sets to the image-start index) as a traced override, so ONE compiled
    step serves ragged prompt lengths — the reference's vLLM path batches
    ragged paired-CFG prompts freely (vllm_inference_solver.py:296-306)."""
    if logits_fn is None or not hasattr(logits_fn, "image_start_idx"):
        return logits_fn

    def bound(logits, positions):
        return logits_fn(logits, positions, start=pos_offsets[1])
    return bound


class _Ctx(NamedTuple):
    """Per-run closure: params + tables (traced constants)."""
    params: dict
    dparams: dict
    rope: tuple
    drope: tuple
    nearest: Optional[jnp.ndarray]
    prefix_valid: Optional[jnp.ndarray]
    # pad mask threaded into DRAFTER forwards — Chameleon families only
    # (cnets_anole.py:721-737); the LlamaGen drafter takes no mask
    # (cnets_llamagen.py:732), so this stays None there even when the BASE
    # model masks caption pads
    drafter_pv: Optional[jnp.ndarray] = None
    # Chameleon-family extras (None for LlamaGen):
    pos_offsets: Optional[jnp.ndarray] = None    # [2] per-branch position shift
    logits_mask: Optional[jnp.ndarray] = None    # [V] True = forbidden token
    # position-dependent logits constraint (Lumina grid FSM):
    # fn(logits [T, V], positions [T]) -> logits; static per run
    logits_fn: object = None
    # traced LANTERN operating point (acc.LanternRT); None = ecfg.lantern's
    # static (k, delta).  Lets one compiled engine serve a (k, delta) sweep.
    lantern_rt: object = None


class TokenPrompt(NamedTuple):
    """Token-based conditioning prefix (Chameleon families): cond/uncond rows
    with per-branch position ids and left-pad masks
    (ea_model_anole.py:1026-1046)."""
    tokens: jnp.ndarray        # [2, L]
    positions: jnp.ndarray     # [2, L] base position ids
    valid: jnp.ndarray         # [2, L] bool (False on left pads)
    pos_diff: jnp.ndarray      # [] uncond position offset (L - 2 for anole)


def _verify_and_update(
    ecfg: SpecDecodeConfig,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    ctx: _Ctx,
    state: SpecState,
    candidates: jnp.ndarray,        # [P, D] token paths (-1 padded)
    node_q: Optional[jnp.ndarray],  # [N+1] residual q (static sampling mode)
    level_probs,                    # tuple (static sampling mode)
    children: jnp.ndarray,          # [N+1, C] child slots
    inlevel_rank,                   # [N+1] or None
    tree_tokens: jnp.ndarray,       # [N+1]
    tree_mask: jnp.ndarray,         # [N+1, N+1]
    tree_pos: jnp.ndarray,          # [N+1] node depths
    retrieve: jnp.ndarray,          # [P, D] slot paths (-1 padded)
    max_depth: int,
):
    """Shared tail of a spec step: base tree forward, acceptance, KV rollback,
    drafter extension.  Returns (state', root_out): the next draft's root
    hidden [2, 1, H], or — with ``ecfg.stale_draft`` — the raw cfg-combined
    logits row [V] at the last accepted node (the passthrough drafter's
    proposal distribution, drf.draft_stale)."""
    N1 = tree_tokens.shape[0]
    P, D = candidates.shape

    # --- base tree-verification forward (provisional KV write) ---
    tok2 = jnp.broadcast_to(tree_tokens[None, :], (2, N1))
    deferred = ecfg.deferred_commit
    # committed length as seen by THIS forward: with deferred commit the
    # previous step's accepted rows are not in the cache yet — they ride in
    # as extra_kv and are committed by this very call
    eff_len = state.base_kv.length + (state.pn if deferred else 0)
    positions = tree_pos + eff_len
    if ctx.pos_offsets is not None:
        positions = jnp.maximum(positions[None, :] - ctx.pos_offsets[:, None], 0)
    if deferred:
        # index contract (mirrors accept_path's jnp.minimum clamp): psel rows
        # past pn may be stale/negative — clip(.., 0) floors negatives, and
        # jnp.take's default mode clamps any entry >= N+1 to the last block
        # row.  Rows past pn land above the committed frontier as garbage and
        # are overwritten by the next commit before any read (kv.write docs).
        sel_prev = jnp.clip(state.psel, 0)
        ex = (jnp.take(state.blk[0], sel_prev, axis=2),
              jnp.take(state.blk[1], sel_prev, axis=2), state.pn)
    else:
        ex = None
    res = tfm.forward(
        ctx.params, cfg, tfm.token_embed(ctx.params, tok2),
        state.base_kv,
        positions=positions,
        rope=ctx.rope,
        block_mask=tree_mask,
        prefix_valid=ctx.prefix_valid,
        commit=False,
        extra_kv=ex,
        defer_block=deferred,
    )
    logits_raw = cfg_combine(tfm.logits_head(ctx.params, res.hidden), ecfg.cfg_scale)[0]
    logits_all = logits_raw
    if ctx.logits_mask is not None:
        # suppress non-image tokens before verification (ea_model_anole:931)
        logits_all = jnp.where(ctx.logits_mask, jnp.finfo(jnp.float32).min, logits_all)
    if ctx.logits_fn is not None:
        # position-indexed constraints over tree nodes (Lumina grid FSM,
        # ea_model_lumina_mgpt.py:600-605); cond-branch positions index the
        # grid state
        logits_all = ctx.logits_fn(logits_all, tree_pos + eff_len)
    hidden_new = res.hidden                                     # [2, N+1, H]

    state_rng, verify_rng, bonus_rng = jax.random.split(state.rng, 3)

    if ecfg.warp.greedy:
        retrieve_safe = jnp.where(retrieve < 0, 0, retrieve)
        path_logits = logits_all[retrieve_safe]                  # [P, D, V]
        best, alen, bonus_logits = acc.greedy_verify(
            path_logits, candidates, ctx.nearest, ecfg.lantern,
            rt=ctx.lantern_rt,
        )
        bonus = jnp.argmax(bonus_logits).astype(jnp.int32)
        sel_slots = retrieve_safe[best]                          # [D]
    else:
        # O(depth x children) tree walk (equivalent to the reference's
        # path-table scan; see tests/test_acceptance.py)
        pinned_u = (None if ecfg.pin is None else
                    jnp.full((max_depth, children.shape[1]), ecfg.pin,
                             jnp.float32))
        walk_path, alen, dist = acc.stochastic_verify_tree(
            verify_rng, logits_all, tree_tokens, children,
            depth=max_depth, warp=ecfg.warp,
            nearest=ctx.nearest, lantern=ecfg.lantern,
            node_q=node_q, level_probs=level_probs,
            node_level_row=inlevel_rank,
            uniforms=pinned_u,
            rt=ctx.lantern_rt,
            batch_warp=ecfg.walk_batch_warp,
        )
        if ecfg.pin is None:
            bonus = jax.random.categorical(
                bonus_rng, jnp.log(jnp.maximum(dist, 1e-30))).astype(jnp.int32)
        else:
            bonus = jnp.argmax(dist).astype(jnp.int32)
        # pad the slot path to the retrieve width D
        sel_slots = jnp.zeros((D,), jnp.int32).at[: walk_path.shape[0]].set(walk_path)

    n_acc = alen + 1                                            # incl. root
    sel_tokens = tree_tokens[sel_slots]                          # [D]

    # --- base KV rollback: compact accepted rows (fused in-kernel gather:
    # the accepted slots all live in the N1-row provisional tree window).
    # Deferred mode: nothing to roll back — the block never hit the cache;
    # the accepted rows commit through the NEXT forward's extra_kv.
    if deferred:
        base_kv = res.kv               # prev accepted rows committed above
    else:
        base_kv = res.kv.accept_path(sel_slots, n_acc, block_size=N1)

    # --- commit tokens ---
    cand_row = jnp.where(jnp.arange(D) < n_acc, sel_tokens, 0)
    tokens = jax.lax.dynamic_update_slice(state.tokens, cand_row.astype(jnp.int32), (state.n_new,))
    n_new = state.n_new + n_acc
    stopped = state.stopped
    if ecfg.stop_ids:
        stops = np.asarray(ecfg.stop_ids, np.int32)
        hit = (cand_row[:, None] == stops[None, :]).any(-1) & (jnp.arange(D) < n_acc)
        stopped = stopped | jnp.any(hit)

    if ecfg.stale_draft:
        # drafter-free mode: the next draft proposes from the raw distribution
        # at the last accepted node (== head(passthrough drafter hidden) at
        # the bonus-token row, see drf.draft_stale) — no drafter extension,
        # no drafter KV
        draft_kv = state.draft_kv
        root_out = logits_raw[sel_slots[alen]]                   # [V]
    else:
        # --- drafter extension over accepted rows ---
        j = jnp.arange(D)
        next_tok = jnp.where(
            j < alen, sel_tokens[jnp.minimum(j + 1, D - 1)], bonus,
        ).astype(jnp.int32)                                      # [D]
        hid_rows = hidden_new[:, sel_slots]                      # [2, D, H]
        out_hidden, draft_kv = drf.extend(
            ctx.dparams, dcfg, ctx.drope, state.draft_kv,
            jnp.broadcast_to(next_tok[None, :], (2, D)), hid_rows, n_acc,
            prefix_valid=ctx.drafter_pv,
            pos_offsets=ctx.pos_offsets,
        )
        root_out = jax.lax.dynamic_slice_in_dim(out_hidden, alen, 1, axis=1)

    state = state._replace(
        base_kv=base_kv,
        draft_kv=draft_kv,
        root_token=bonus,
        tokens=tokens,
        n_new=n_new,
        steps=state.steps + 1,
        accept_sum=state.accept_sum + n_acc,
        rng=state_rng,
        stopped=stopped,
        **(dict(blk=res.block, psel=sel_slots, pn=n_acc) if deferred else {}),
    )
    return state, root_out


def make_static_step(
    ecfg: SpecDecodeConfig,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    spec: TreeSpec,
    ctx: _Ctx,
):
    """One EAGLE-1 static-tree speculative step as a pure function."""
    # host numpy, not jnp: these become jaxpr constants when the step is
    # traced; device-resident constants force a device->host readback during
    # MLIR lowering (pathological over the remote-TPU tunnel)
    tree_indices = np.asarray(spec.tree_indices)
    retrieve = np.asarray(spec.retrieve_indices)
    attn_mask = np.asarray(spec.attn_mask)
    depth_arr = np.asarray(spec.depth)
    children = np.asarray(spec.children)
    inlevel = np.asarray(spec.inlevel_rank)
    sampling = ecfg.warp.active

    def step(state: SpecState) -> SpecState:
        d: drf.StaticDraft = state.draft
        # --- candidate assembly (generate_candidates, ea_model:676-706) ---
        cand_vec = jnp.concatenate(
            [state.root_token.reshape(1), d.ss_token.reshape(-1)]
        )
        tree_tokens = cand_vec[tree_indices]                     # [N+1]
        ext = jnp.concatenate([tree_tokens, jnp.array([-1], jnp.int32)])
        candidates = _safe_gather_ext(ext, retrieve)             # [P, D]
        if sampling:
            q_vec = jnp.concatenate(
                [jnp.ones((1,), jnp.float32), d.ss_prob.reshape(-1)]
            )
            node_q = q_vec[tree_indices]                         # [N+1]
            level_probs = d.level_probs
        else:
            node_q, level_probs = None, None

        state, root_out = _verify_and_update(
            ecfg, cfg, dcfg, ctx, state,
            candidates, node_q, level_probs,
            children, inlevel if sampling else None,
            tree_tokens, attn_mask, depth_arr, retrieve, spec.max_depth,
        )

        # --- next draft tree ---
        rng, draft_rng = jax.random.split(state.rng)
        if ecfg.stale_draft:
            committed = state.base_kv.length + (
                state.pn if ecfg.deferred_commit else 0)
            new_draft = drf.draft_stale(
                spec, root_out, committed, ecfg.dwarp, draft_rng,
                logits_mask=ctx.logits_mask, logits_fn=ctx.logits_fn,
                pin=ecfg.pin,
            )
            return state._replace(draft=new_draft, rng=rng)
        new_draft, dkv = drf.draft_static(
            ctx.dparams, dcfg, spec, ctx.drope, state.draft_kv, root_out,
            quant.head_of(ctx.params), ecfg.cfg_scale, ecfg.dwarp, draft_rng,
            pos_offsets=ctx.pos_offsets, logits_mask=ctx.logits_mask,
            logits_fn=ctx.logits_fn, prefix_valid=ctx.drafter_pv,
            pin=ecfg.pin,
        )
        return state._replace(draft=new_draft, draft_kv=dkv, rng=rng)

    return step


def make_dynamic_step(
    ecfg: SpecDecodeConfig,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    ctx: _Ctx,
):
    """One EAGLE-2 dynamic-tree speculative step."""

    def step(state: SpecState) -> SpecState:
        d: drf.DynamicDraft = state.draft
        retrieve = d.retrieve_indices
        ext = jnp.concatenate([d.draft_tokens, jnp.array([-1], jnp.int32)])
        candidates = _safe_gather_ext(ext, retrieve)

        state, root_hidden = _verify_and_update(
            ecfg, cfg, dcfg, ctx, state,
            candidates, None, None, d.children, None,
            d.draft_tokens, d.tree_mask, d.tree_position_ids, retrieve,
            dcfg.depth + 1,
        )

        new_draft, dkv = drf.draft_dynamic(
            ctx.dparams, dcfg, ctx.drope, state.draft_kv, root_hidden,
            state.root_token, quant.head_of(ctx.params), ecfg.cfg_scale, ecfg.dwarp,
            pos_offsets=ctx.pos_offsets, logits_mask=ctx.logits_mask,
            logits_fn=ctx.logits_fn, prefix_valid=ctx.drafter_pv,
        )
        return state._replace(draft=new_draft, draft_kv=dkv)

    return step


def prefill_request(
    params: dict,
    dparams: dict,
    ecfg: SpecDecodeConfig,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    spec: Optional[TreeSpec],
    cond,
    uncond,
    rng: jax.Array,
    prefix_valid: Optional[jnp.ndarray] = None,
    token_prompt: Optional[TokenPrompt] = None,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
):
    """Prefill one request: base+drafter prefixes, first token, first draft
    tree.  Returns ``(SpecState, prefix_valid [2, S] bool, pos_offsets [2])``
    — the per-request leaves a batched engine stacks over slots."""
    rope = tfm.make_rope_tables(cfg)
    drope = tfm.make_rope_tables(dcfg.model)
    nearest = params.get("nearest_latents")
    if ecfg.lantern.enabled and nearest is None:
        raise ValueError("lantern enabled but params lack 'nearest_latents'")

    if ecfg.stale_draft and ecfg.mode != "static":
        raise ValueError("stale_draft requires mode='static'")
    pad = (spec.path_len if ecfg.mode == "static" else dcfg.depth + 2) + 1
    base_kv = KVCache.create(cfg, 2, quantized=ecfg.kv_quant)
    # stale mode never runs the drafter: its cache is a minimal stub kept
    # only so SpecState's pytree structure is mode-independent
    dk = KVCache.create(dcfg.model, 2,
                        max_len=1 if ecfg.stale_draft else None)
    S = base_kv.max_len
    if token_prompt is not None and prefix_valid is not None:
        # the prompt's own pad mask (token_prompt.valid) is authoritative
        # for token-prompt requests; a separately-passed mask would be
        # silently overwritten below, so reject the ambiguity
        raise ValueError("pass padding via token_prompt.valid, not "
                         "prefix_valid, for token-prompt requests")
    if prefix_valid is not None and prefix_valid.shape[-1] != S:
        # KV buffers round up to the flash-kernel block size; pad the mask
        prefix_valid = jnp.pad(
            prefix_valid, ((0, 0), (0, S - prefix_valid.shape[-1])),
            constant_values=True,
        )
    offs = jnp.zeros((2,), jnp.int32)

    if token_prompt is None:
        Tc = cfg.cls_token_num
        if prefix_valid is None:
            prefix_valid = jnp.ones((2, S), bool)
        ctx = _Ctx(params=params, dparams=dparams, rope=rope, drope=drope,
                   nearest=nearest, prefix_valid=prefix_valid,
                   pos_offsets=offs, logits_mask=logits_mask,
                   logits_fn=logits_fn)
        # ---- base prefill (cond/uncond embedding pair) ----
        cond_pair = jnp.concatenate([cond, uncond], axis=0)
        embeds = tfm.cond_embed(ctx.params, cfg, cond_pair)
        # caption padding must mask the prefill block itself, not only later
        # reads of the cached prefix
        block0 = jnp.tril(jnp.ones((Tc, Tc), bool))[None] & \
            prefix_valid[:, None, :Tc]
        res = tfm.forward(
            ctx.params, cfg, embeds, base_kv, jnp.arange(Tc), rope,
            block_mask=block0,
        )
        base_kv = res.kv
        logits0 = cfg_combine(tfm.logits_head(ctx.params, res.hidden[:, -1:]), ecfg.cfg_scale)
        rng, r0 = jax.random.split(rng)
        l0 = _mask_logits(logits0[0, -1], logits_mask)
        t0 = (jnp.argmax(l0) if ecfg.pin is not None
              else sample_token(r0, l0, ecfg.warp)).astype(jnp.int32)

        if ecfg.stale_draft:
            root_out = logits0[0, -1]          # raw: masks re-apply per level
            dk = dk.commit(Tc)
        else:
            # ---- drafter prefill: (shifted tokens, base hiddens) ----
            dtok = jnp.concatenate(
                [jnp.zeros((Tc - 1,), jnp.int32), t0.reshape(1)]
            ) if Tc > 1 else t0.reshape(1)
            dtok2 = jnp.broadcast_to(dtok[None, :], (2, Tc))
            out_hidden, dk = drf.extend(
                ctx.dparams, dcfg, drope, dk, dtok2, res.hidden, Tc,
            )
            root_out = out_hidden[:, -1:]
    else:
        tp = token_prompt
        L = tp.tokens.shape[1]
        pv = jnp.ones((2, S), bool)
        pv = jax.lax.dynamic_update_slice(pv, tp.valid.astype(bool), (0, 0))
        prefix_valid = pv
        offs = jnp.stack([jnp.zeros((), jnp.int32), tp.pos_diff.astype(jnp.int32)])
        logits_fn = bind_logits_fn(logits_fn, offs)
        ctx = _Ctx(params=params, dparams=dparams, rope=rope, drope=drope,
                   nearest=nearest, prefix_valid=prefix_valid,
                   drafter_pv=prefix_valid,
                   pos_offsets=offs, logits_mask=logits_mask,
                   logits_fn=logits_fn)
        # ---- base prefill over the token prompt ----
        block = jnp.tril(jnp.ones((L, L), bool))[None] & tp.valid[:, None, :].astype(bool)
        res = tfm.forward(
            ctx.params, cfg, tfm.token_embed(ctx.params, tp.tokens), base_kv,
            tp.positions, rope, block_mask=block,
        )
        base_kv = res.kv
        logits0 = cfg_combine(tfm.logits_head(ctx.params, res.hidden[:, -1:]), ecfg.cfg_scale)
        rng, r0 = jax.random.split(rng)
        first_logits = _mask_logits(logits0[0, -1], logits_mask)
        if logits_fn is not None:
            first_logits = logits_fn(
                first_logits[None, :], (L - 1) + jnp.zeros((1,), jnp.int32)
            )[0]
        t0 = (jnp.argmax(first_logits) if ecfg.pin is not None
              else sample_token(r0, first_logits, ecfg.warp)).astype(jnp.int32)

        if ecfg.stale_draft:
            root_out = logits0[0, -1]          # raw: masks re-apply per level
            dk = dk.commit(L)
        else:
            # ---- drafter prefill: tokens shifted left one, hiddens aligned --
            dtok = jnp.concatenate(
                [tp.tokens[:, 1:], jnp.broadcast_to(t0.reshape(1, 1), (2, 1))],
                axis=1,
            )
            dpos = jnp.arange(L)[None, :]
            dpos = jnp.maximum(dpos - offs[:, None], 0)
            # the reference threads the left-pad attention_mask into the
            # drafter prefill itself (ea_model_anole.py:437): pad rows must be
            # invisible within the prompt block, not only in later prefix reads
            out_hidden, dk = drf.extend(
                ctx.dparams, dcfg, drope, dk, dtok, res.hidden, L,
                prefix_valid=prefix_valid, positions=dpos,
                block_valid=tp.valid,
            )
            root_out = out_hidden[:, -1:]

    rng, draft_rng = jax.random.split(rng)
    if ecfg.mode == "static" and ecfg.stale_draft:
        draft, draft_kv = drf.draft_stale(
            spec, root_out, base_kv.length, ecfg.dwarp, draft_rng,
            logits_mask=ctx.logits_mask, logits_fn=ctx.logits_fn,
            pin=ecfg.pin,
        ), dk
    elif ecfg.mode == "static":
        draft, draft_kv = drf.draft_static(
            ctx.dparams, dcfg, spec, drope, dk, root_out,
            quant.head_of(ctx.params), ecfg.cfg_scale, ecfg.dwarp, draft_rng,
            pos_offsets=ctx.pos_offsets, logits_mask=ctx.logits_mask,
            logits_fn=ctx.logits_fn, prefix_valid=ctx.drafter_pv,
            pin=ecfg.pin,
        )
    else:
        draft, draft_kv = drf.draft_dynamic(
            ctx.dparams, dcfg, drope, dk, root_out, t0,
            quant.head_of(ctx.params), ecfg.cfg_scale, ecfg.dwarp,
            pos_offsets=ctx.pos_offsets, logits_mask=ctx.logits_mask,
            logits_fn=ctx.logits_fn, prefix_valid=ctx.drafter_pv,
        )

    if ecfg.deferred_commit:
        if ecfg.mode != "static":
            raise ValueError("deferred_commit requires mode='static'")
        N1 = int(spec.tree_indices.shape[0])
        D = int(spec.retrieve_indices.shape[1])
        zblk = jnp.zeros(
            (cfg.num_layers, 2, N1, cfg.num_kv_heads, cfg.head_dim),
            cfg.jnp_dtype)
        pend = dict(blk=(zblk, zblk), psel=jnp.zeros((D,), jnp.int32),
                    pn=jnp.zeros((), jnp.int32))
    else:
        pend = {}
    state = SpecState(
        base_kv=base_kv,
        draft_kv=draft_kv,
        draft=draft,
        root_token=t0,
        tokens=jnp.zeros((ecfg.max_new + pad,), jnp.int32),
        n_new=jnp.zeros((), jnp.int32),
        steps=jnp.zeros((), jnp.int32),
        accept_sum=jnp.zeros((), jnp.int32),
        rng=rng,
        stopped=jnp.zeros((), bool),
        **pend,
    )
    return state, prefix_valid, offs


@partial(jax.jit, static_argnames=("ecfg", "cfg", "dcfg", "spec", "max_steps", "logits_fn"))
def generate(
    params: dict,
    dparams: dict,
    ecfg: SpecDecodeConfig,
    cfg: ModelConfig,
    dcfg: DrafterConfig,
    spec: Optional[TreeSpec],
    cond,                           # [1] labels or [1, Tc, Dc] caption feats
    uncond,
    rng: jax.Array,
    max_steps: int = 0,
    prefix_valid: Optional[jnp.ndarray] = None,
    token_prompt: Optional[TokenPrompt] = None,
    logits_mask: Optional[jnp.ndarray] = None,
    logits_fn=None,
    lantern_rt: Optional[acc.LanternRT] = None,
) -> SpecResult:
    """Full speculative generation for one request.  ``spec`` is required in
    static mode and ignored in dynamic mode.

    Two conditioning styles: embedding prefixes (LlamaGen labels/captions;
    pass ``cond``/``uncond``) or token prompts (Chameleon families; pass
    ``token_prompt``, with cond/uncond ignored).

    ``lantern_rt`` (traced (k, delta), ``acc.LanternSpec.runtime``) overrides
    the static operating point without recompiling — ``ecfg.lantern.k`` still
    bounds the neighbor-table width.
    """
    max_steps = max_steps or ecfg.max_new
    state, prefix_valid, offs = prefill_request(
        params, dparams, ecfg, cfg, dcfg, spec, cond, uncond, rng,
        prefix_valid=prefix_valid, token_prompt=token_prompt,
        logits_mask=logits_mask, logits_fn=logits_fn,
    )
    ctx = _Ctx(params=params, dparams=dparams,
               rope=tfm.make_rope_tables(cfg),
               drope=tfm.make_rope_tables(dcfg.model),
               nearest=params.get("nearest_latents"),
               prefix_valid=prefix_valid,
               drafter_pv=prefix_valid if token_prompt is not None else None,
               pos_offsets=offs,
               logits_mask=logits_mask,
               logits_fn=(bind_logits_fn(logits_fn, offs)
                          if token_prompt is not None else logits_fn),
               lantern_rt=lantern_rt)
    if ecfg.mode == "static":
        step = make_static_step(ecfg, cfg, dcfg, spec, ctx)
    else:
        step = make_dynamic_step(ecfg, cfg, dcfg, ctx)

    def cond_fn(s: SpecState):
        return (s.n_new < ecfg.max_new) & (s.steps < max_steps) & ~s.stopped

    state = jax.lax.while_loop(cond_fn, step, state)
    toks = state.tokens[: ecfg.max_new]
    n_valid = jnp.minimum(state.n_new, ecfg.max_new)
    if ecfg.stop_ids:
        stops = np.asarray(ecfg.stop_ids, np.int32)
        hit = ((toks[:, None] == stops[None, :]).any(-1)
               & (jnp.arange(ecfg.max_new) < n_valid))
        n_valid = jnp.where(jnp.any(hit),
                            jnp.argmax(hit).astype(jnp.int32) + 1, n_valid)
    return SpecResult(
        tokens=toks,
        steps=state.steps,
        accept_sum=state.accept_sum,
        n_valid=n_valid,
    )
