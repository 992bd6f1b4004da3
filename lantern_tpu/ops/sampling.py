"""Logit warping, CFG combination, and categorical sampling as pure jnp ops.

TPU-first design notes:
- All warps are vectorized over arbitrary leading batch dims and keep static
  shapes (no host-side `.item()` syncs; PRNG is threaded `jax.random` keys).
- A ``LogitsWarp`` spec is a static (hashable) config captured at trace time,
  mirroring the reference's ``prepare_logits_processor``
  (/root/reference/models/drafters/utils.py:36-52): temperature -> top-p ->
  top-k, each enabled only when active.  The vanilla AR path in the reference
  uses top-k -> top-p order instead
  (/root/reference/models/ea_model_llamagen.py:35-86); both orders coincide for
  the published operating points (only one filter active at a time), and
  `warp_order` selects between them for exact parity runs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


@dataclasses.dataclass(frozen=True)
class LogitsWarp:
    """Static sampling config.  ``temperature <= 1e-5`` means greedy decoding."""

    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    warp_order: str = "hf"  # "hf": temp->top_p->top_k; "ar": temp->top_k->top_p

    @property
    def greedy(self) -> bool:
        return self.temperature <= 1e-5

    @property
    def active(self) -> bool:
        """Whether any warp modifies the logits (reference gates on temperature)."""
        return not self.greedy


def cfg_combine(logits: jnp.ndarray, cfg_scale: float) -> jnp.ndarray:
    """Classifier-free-guidance combine over a leading cond/uncond factor-2 axis.

    ``logits``: [2*B, ..., V] with the first half conditional rows.  Returns
    [B, ..., V] = uncond + scale * (cond - uncond).
    (reference: models/ea_model_llamagen.py:26-29)
    """
    cond, uncond = jnp.split(logits, 2, axis=0)
    return uncond + (cond - uncond) * cfg_scale


def kth_largest(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-th largest value per row, via binary search on the float bit
    pattern — O(32 · V) elementwise work instead of a full O(V log V) sort.

    Rationale: ``lax.top_k`` with large k (the warp's top-2000 over a 16K
    VQ vocab) lowers to a whole-row sort on TPU and dominates sampling cost;
    the filter only needs the threshold *value*.  Monotone trick: reinterpret
    float32 as int32 and flip negative values' magnitude bits so integer
    order == float order (total order, NaN-free inputs assumed).
    """
    x = logits.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    # map to monotone unsigned-comparable space: flip sign bit for positives,
    # flip all bits for negatives
    sign_bit = jnp.int32(-0x80000000)
    xi = jnp.where(xi < 0, ~xi, xi ^ sign_bit)
    xu = xi.astype(jnp.uint32)

    rows = xu.shape[:-1]
    lo = jnp.zeros(rows + (1,), jnp.uint32)
    hi = jnp.full(rows + (1,), jnp.uint32(0xFFFFFFFF))

    def body(_, lohi):
        lo, hi = lohi
        d = hi - lo
        mid = lo + d // 2 + (d & 1)     # ceil midpoint w/o uint32 overflow;
        # round up because lo carries the count(>=lo) >= k invariant
        ge = (xu >= mid).sum(axis=-1, keepdims=True)
        take = ge >= k          # at least k elements >= mid: threshold >= mid
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid - 1)

    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    # undo the monotone map: u >= 0x80000000 came from non-negative floats
    # (clear the sign-bit xor); the rest from negatives (undo the bit-flip)
    restored = jnp.where(
        lo >= jnp.uint32(0x80000000),
        lo.astype(jnp.int32) ^ jnp.int32(-0x80000000),
        ~lo.astype(jnp.int32),
    )
    return jax.lax.bitcast_convert_type(restored, jnp.float32)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask everything below the k-th largest logit to -inf. Static k.

    Ties at the threshold are all kept (same as thresholding on
    ``lax.top_k(...)[0][..., -1]``).  Uses the bit-search ``kth_largest``
    for large k where sort-based top_k is slow; plain top_k for small k.
    """
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    if k <= 128:
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
    else:
        kth = kth_largest(logits, k).astype(logits.dtype)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest prefix of the sorted distribution
    with cumulative probability >= p (the first token crossing the threshold is
    kept, matching the HF shift-right convention)."""
    if p >= 1.0 or p <= 0.0:
        # reference gates top_p to (1e-8, 1.0) and treats anything else as
        # disabled (prepare_logits_processor); p <= 0 would otherwise mask
        # EVERY token and degrade sampling to uniform noise
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # remove sorted positions whose *previous* cumulative mass already >= p
    remove = (cum - probs) >= p
    # threshold logit = smallest kept logit
    kept = jnp.where(remove, jnp.inf, sorted_logits)
    thresh = jnp.min(kept, axis=-1, keepdims=True)
    return jnp.where(logits < thresh, NEG_INF, logits)


def warp_logits(logits: jnp.ndarray, warp: LogitsWarp) -> jnp.ndarray:
    """Apply the static warp spec. No-op for greedy."""
    if warp.greedy:
        return logits
    if warp.temperature != 1.0:
        logits = logits / warp.temperature
    if warp.warp_order == "ar":
        logits = apply_top_k(logits, warp.top_k)
        logits = apply_top_p(logits, warp.top_p)
    else:
        logits = apply_top_p(logits, warp.top_p)
        logits = apply_top_k(logits, warp.top_k)
    return logits


def sample_token(
    rng: jax.Array, logits: jnp.ndarray, warp: LogitsWarp
) -> jnp.ndarray:
    """Warp + sample (or argmax when greedy). Returns int32 token ids with the
    leading batch shape of ``logits``."""
    if warp.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    warped = warp_logits(logits, warp)
    return jax.random.categorical(rng, warped, axis=-1).astype(jnp.int32)


def sample_without_replacement(
    rng: jax.Array, probs: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw k tokens without replacement from each row of ``probs`` [.., V] via
    the Gumbel top-k trick, and return the reference drafter's residual
    acceptance probabilities.

    Returns ``(indices [.., k], q_probs [.., k])`` where
    ``q_probs[i] = p(x_i) / (1 - sum_{j<i} p(x_j))`` clamped to [0, 1] with
    degenerate entries (inf/nan residual) zeroed so the verifier skips them,
    matching ``Model.sample``
    (/root/reference/models/drafters/cnets_llamagen.py:924-940).
    """
    logp = jnp.log(jnp.maximum(probs, 1e-30))
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(rng, probs.shape, minval=1e-20, maxval=1.0)))
    _, idx = jax.lax.top_k(logp + gumbel, k)
    p_sel = jnp.take_along_axis(probs, idx, axis=-1)
    prev_cum = jnp.cumsum(p_sel, axis=-1) - p_sel
    q = p_sel / (1.0 - prev_cum)
    q = jnp.where(jnp.isfinite(q), jnp.clip(q, 0.0, 1.0), 0.0)
    return idx.astype(jnp.int32), q
