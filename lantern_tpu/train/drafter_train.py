"""Drafter self-distillation training in JAX/optax.

Reference: entrypoints/train_drafter/main.py — the drafter regresses the base
model's next hidden state (SmoothL1 "vloss") and distills the base head's
distribution (soft cross-entropy "ploss", weighted p_w), teacher-forced over
(token, hidden) pairs with an image-token loss mask, AdamW(0.9, 0.95) with
linear warmup+decay and gradient value-clipping.  The optional CFG-aware loss
combines cond/uncond logit pairs before the soft-CE
(train_drafter/main.py:133-160).

TPU-first: the whole step (noise augmentation, forward, loss, clip, update,
metrics) is one jitted function; data parallelism = shard the batch over the
``dp`` mesh axis with replicated params (XLA inserts the gradient psum).

Sample format (one .npz per sequence, produced by generate_train_data):
  tokens    [T] int32   drafter input tokens (shifted stream: token_{i+1})
  hidden    [T, H]      base hidden states h_i (post final norm)
  target    [T, H]      h_{i+1} (zero row at the end)
  loss_mask [T] f32     1 on image-token positions
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import DrafterConfig
from ..kv import KVCache
from ..models import drafter as drf
from ..models import transformer as tfm


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    betas: tuple = (0.9, 0.95)
    grad_clip: float = 0.5
    p_w: float = 0.1
    # vloss weight.  The reference fixes it at 1.0 (train_drafter/main.py:162)
    # but acceptance is a *distributional* event (~ 1 - TV(q, p)), and on a
    # random-weight bench base the CE-dominant objective (v_w << p_w) is the
    # deployment-aligned one: vloss-dominant training measurably DEGRADES
    # self-rollout compression from the passthrough init (PERF.md, round 3).
    v_w: float = 1.0
    num_epochs: int = 20
    warmup_steps: int = 0
    total_steps: int = 0
    noise: str = "uniform"           # "uniform" | "gaussian" | "none"
    noise_std: float = 0.2
    cfg_loss: bool = False
    cfg_scale: float = 3.0
    # On-policy rollout supervision (beyond the reference trainer): at tree
    # depth > 1 the drafter consumes its OWN predicted hidden states, which
    # teacher-forced training never shows it.  rollout_depth > 1 re-runs the
    # drafter over its own predictions (tokens stay teacher-forced) and adds
    # a soft-CE term per extra level, weighted rollout_w ** (level - 1) —
    # directly optimizing deep-level acceptance.
    rollout_depth: int = 1
    rollout_w: float = 0.5
    # Chunked head loss: the soft-CE materializes [B, T, V] logits twice,
    # which at Chameleon geometry (T~2400, V=65536) is gigabytes per batch
    # row.  head_chunk > 0 computes the soft-CE/metrics in T-chunks under a
    # rematerialized lax.scan (identical math, checked by test_training).
    head_chunk: int = 0
    # Rematerialize the drafter forward under value_and_grad: the dense
    # T x T attention probs (~0.7 GB per row at T~2400, 32 heads, f32) are
    # otherwise saved as backward residuals, which blows the 16 GB v5e HBM
    # next to the resident trace stack.  Identical math (test_training).
    remat: bool = False


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def add_noise(rng: jax.Array, hidden: jnp.ndarray, tcfg: TrainConfig) -> jnp.ndarray:
    """Reference noise augmentation (data_utils.py:16-41): uniform noise is
    scaled by 512/seq_len."""
    if tcfg.noise == "none" or tcfg.noise_std == 0.0:
        return hidden
    if tcfg.noise == "uniform":
        scale = tcfg.noise_std * 512.0 / hidden.shape[1]
        return hidden + (jax.random.uniform(rng, hidden.shape) - 0.5) * scale
    return hidden + jax.random.normal(rng, hidden.shape) * tcfg.noise_std


class Metrics(NamedTuple):
    loss: jnp.ndarray
    vloss: jnp.ndarray
    ploss: jnp.ndarray
    correct: jnp.ndarray     # top-1 vs the base head's argmax
    top_acc: jnp.ndarray     # [3] top-1/2/3 correct counts
    total: jnp.ndarray


def drafter_teacher_forward(
    dparams: dict, dcfg: DrafterConfig, rope, tokens, hidden, attn_valid,
    positions=None,
) -> jnp.ndarray:
    """Teacher-forced causal drafter forward over full sequences (no cache
    reuse — training batches are independent).  ``positions`` [B, T]
    overrides the default arange — Chameleon CFG pairs train with the
    deployment position scheme (uncond rows restart at the image start,
    cnets_anole.py:817-830)."""
    B, T = tokens.shape
    # dense attention only: this forward sits under value_and_grad and the
    # pallas flash kernel has no autodiff rule (training is full-sequence
    # causal anyway, where dense is the right choice)
    mcfg = dcfg.model.replace(use_flash_attention=False)
    kv = KVCache.create(mcfg, B, max_len=T)
    x = drf.fuse_inputs(dparams, tokens, hidden)
    block = jnp.tril(jnp.ones((T, T), bool))[None] & attn_valid[:, None, :].astype(bool)
    res = tfm.forward(
        dparams, mcfg, x, kv,
        jnp.arange(T) if positions is None else positions, rope,
        block_mask=block, commit=False,
    )
    return res.hidden


def _soft_ce_and_topacc(out_head, tgt_head, m):
    """Summed soft-CE and top-1/2/3 hit counts over one logits block.
    ``m`` [B, C, 1] loss mask."""
    tgt_p = jax.nn.softmax(tgt_head, axis=-1)
    out_logp = jax.nn.log_softmax(out_head, axis=-1)
    pl = -jnp.sum(m * jnp.sum(tgt_p * out_logp, -1, keepdims=True))
    tgt_tok = jnp.argmax(tgt_head, axis=-1)
    _, topk = jax.lax.top_k(out_head, 3)
    hits = topk == tgt_tok[..., None]
    mm = m[..., 0]
    acc = jnp.stack(
        [jnp.sum(mm * jnp.any(hits[..., : k + 1], -1)) for k in range(3)]
    )
    return pl, acc


def _head_ce_sums(predict, target, mask, head, tcfg: TrainConfig):
    """(soft-CE sum, top-acc counts [3]) for drafter hiddens vs teacher
    hiddens through the frozen head — full-logits or T-chunked
    (``tcfg.head_chunk``), bitwise-same math either way."""
    if tcfg.head_chunk <= 0:
        out_head = (predict @ head).astype(jnp.float32)
        tgt_head = jax.lax.stop_gradient((target @ head).astype(jnp.float32))
        m = mask
        if tcfg.cfg_loss:
            tgt_head = tgt_head[::2] + tcfg.cfg_scale * (tgt_head[::2] - tgt_head[1::2])
            out_head = out_head[::2] + tcfg.cfg_scale * (out_head[::2] - out_head[1::2])
            m = mask[::2]
        return _soft_ce_and_topacc(out_head, tgt_head, m)

    chunk = tcfg.head_chunk
    B, T, H = predict.shape
    pad = (-T) % chunk
    if pad:
        predict = jnp.pad(predict, ((0, 0), (0, pad), (0, 0)))
        target = jnp.pad(target, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad), (0, 0)))
    nc = (T + pad) // chunk

    def to_chunks(a):
        return a.reshape(B, nc, chunk, -1).transpose(1, 0, 2, 3)

    xs = (to_chunks(predict), to_chunks(target), to_chunks(mask))

    @jax.checkpoint
    def body(carry, x):
        pr, tg, m = x
        out_head = (pr @ head).astype(jnp.float32)
        tgt_head = jax.lax.stop_gradient((tg @ head).astype(jnp.float32))
        if tcfg.cfg_loss:
            tgt_head = tgt_head[::2] + tcfg.cfg_scale * (tgt_head[::2] - tgt_head[1::2])
            out_head = out_head[::2] + tcfg.cfg_scale * (out_head[::2] - out_head[1::2])
            m = m[::2]
        pl, acc = _soft_ce_and_topacc(out_head, tgt_head, m)
        return (carry[0] + pl, carry[1] + acc), None

    (pl, acc), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.float32), jnp.zeros((3,), jnp.float32)), xs
    )
    return pl, acc


def loss_and_metrics(
    dparams: dict,
    dcfg: DrafterConfig,
    rope,
    head: jnp.ndarray,            # [H, V] frozen base lm_head
    batch: dict,
    tcfg: TrainConfig,
) -> tuple[jnp.ndarray, Metrics]:
    positions = batch.get("positions")

    def _fwd(dparams, tokens, hidden, positions):
        return drafter_teacher_forward(
            dparams, dcfg, rope, tokens, hidden, batch["attn_valid"],
            positions=positions,
        )

    if tcfg.remat:
        _fwd = jax.checkpoint(_fwd)
    predict = _fwd(dparams, batch["tokens"], batch["hidden"], positions)
    target = batch["target"]
    mask = batch["loss_mask"][..., None]                     # [B, T, 1]

    vloss = jnp.sum(mask * jnp.mean(smooth_l1(predict, target), -1, keepdims=True))
    vloss = vloss / (jnp.sum(mask) + 1e-5)

    # soft-CE + top-k metrics through the frozen head; rows alternate
    # (cond, uncond) when cfg_loss combines them (train_drafter/main.py:
    # 143-150).  head_chunk > 0 streams the [B, T, V] logits in chunks.
    pl_sum, top_acc = _head_ce_sums(predict, target, mask, head, tcfg)
    p_mask = mask[::2] if tcfg.cfg_loss else mask
    n_mask = jnp.sum(p_mask)
    ploss = pl_sum / (n_mask + 1e-5)

    loss = tcfg.v_w * vloss + tcfg.p_w * ploss

    # --- on-policy rollout levels (rollout_depth > 1) ---
    # level d consumes (teacher token_{p+d-1}, drafter's own level-(d-1)
    # hidden at p) and matches the teacher head distribution d steps ahead.
    h_prev = predict

    def shift_left(x, s):
        if s == 0:
            return x
        pad = [(0, 0)] * x.ndim
        pad[1] = (0, s)
        return jnp.pad(x[:, s:], pad)

    for d in range(2, tcfg.rollout_depth + 1):
        tok_d = shift_left(batch["tokens"], d - 1)
        h_d = _fwd(dparams, tok_d, h_prev, positions)
        tgt_d = shift_left(target, d - 1)
        # valid where the whole d-step window sits inside the loss region
        m_d = batch["loss_mask"] * shift_left(batch["loss_mask"], d - 1)
        pl_d, _ = _head_ce_sums(h_d, tgt_d, m_d[..., None], head, tcfg)
        m_dn = m_d[::2] if tcfg.cfg_loss else m_d
        pl_d = pl_d / (jnp.sum(m_dn) + 1e-5)
        loss = loss + tcfg.p_w * (tcfg.rollout_w ** (d - 1)) * pl_d
        h_prev = h_d

    metrics = Metrics(
        loss=loss, vloss=vloss, ploss=ploss,
        correct=top_acc[0], top_acc=top_acc, total=n_mask,
    )
    return loss, metrics


class TrainState(NamedTuple):
    dparams: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def build_optimizer(tcfg: TrainConfig):
    if tcfg.warmup_steps > 0 and tcfg.total_steps > 0:
        lr = optax.join_schedules(
            [
                optax.linear_schedule(0.0, tcfg.lr, tcfg.warmup_steps),
                optax.linear_schedule(
                    tcfg.lr, 0.0, max(tcfg.total_steps - tcfg.warmup_steps, 1)
                ),
            ],
            [tcfg.warmup_steps],
        )
    else:
        lr = tcfg.lr
    return optax.chain(
        optax.clip(tcfg.grad_clip),   # value clip (accelerator.clip_grad_value_)
        optax.adamw(lr, b1=tcfg.betas[0], b2=tcfg.betas[1]),
    )


def init_train_state(dparams: dict, tcfg: TrainConfig) -> TrainState:
    opt = build_optimizer(tcfg)
    trainable = {k: v for k, v in dparams.items() if k != "embed"}
    return TrainState(
        dparams=dparams, opt_state=opt.init(trainable), step=jnp.zeros((), jnp.int32)
    )


@partial(jax.jit, static_argnames=("dcfg", "tcfg"))
def train_step(
    state: TrainState,
    dcfg: DrafterConfig,
    tcfg: TrainConfig,
    rope,
    head: jnp.ndarray,
    batch: dict,
    rng: jax.Array,
) -> tuple[TrainState, Metrics]:
    batch = dict(batch, hidden=add_noise(rng, batch["hidden"], tcfg))

    def lf(trainable):
        dparams = dict(trainable, embed=state.dparams["embed"])
        return loss_and_metrics(dparams, dcfg, rope, head, batch, tcfg)

    trainable = {k: v for k, v in state.dparams.items() if k != "embed"}
    (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(trainable)
    opt = build_optimizer(tcfg)
    updates, opt_state = opt.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    dparams = dict(trainable, embed=state.dparams["embed"])
    return TrainState(dparams=dparams, opt_state=opt_state, step=state.step + 1), metrics


@partial(jax.jit, static_argnames=("dcfg", "tcfg"))
def eval_step(
    state: TrainState, dcfg: DrafterConfig, tcfg: TrainConfig, rope,
    head: jnp.ndarray, batch: dict,
) -> Metrics:
    _, metrics = loss_and_metrics(state.dparams, dcfg, rope, head, batch, tcfg)
    return metrics


# ---------------------------------------------------------------------------
# data pipeline
# ---------------------------------------------------------------------------

def load_sample(path: str) -> dict:
    z = np.load(path)
    return {k: z[k] for k in ("tokens", "hidden", "target", "loss_mask")}


def batch_iterator(
    paths, batch_size: int, max_len: int, rng: np.random.Generator,
    shuffle: bool = True,
) -> Iterator[dict]:
    """Pad/truncate samples to ``max_len`` and batch them; ``attn_valid``
    masks pad columns out of the causal attention."""
    order = np.arange(len(paths))
    if shuffle:
        rng.shuffle(order)
    for i in range(0, len(order) - batch_size + 1, batch_size):
        toks, hids, tgts, masks, valid = [], [], [], [], []
        for j in order[i : i + batch_size]:
            s = load_sample(paths[j])
            T = min(len(s["tokens"]), max_len)
            H = s["hidden"].shape[-1]
            t = np.zeros((max_len,), np.int32)
            h = np.zeros((max_len, H), np.float32)
            g = np.zeros((max_len, H), np.float32)
            m = np.zeros((max_len,), np.float32)
            v = np.zeros((max_len,), np.float32)
            t[:T] = s["tokens"][:T]
            h[:T] = s["hidden"][:T]
            g[:T] = s["target"][:T]
            m[:T] = s["loss_mask"][:T]
            v[:T] = 1.0
            toks.append(t); hids.append(h); tgts.append(g)
            masks.append(m); valid.append(v)
        yield {
            "tokens": np.stack(toks), "hidden": np.stack(hids),
            "target": np.stack(tgts), "loss_mask": np.stack(masks),
            "attn_valid": np.stack(valid),
        }
