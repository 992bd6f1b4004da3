"""High-level generation sessions: model + drafter + codec + prompts -> images.

This is the user-facing API layer (reference: EaModel.from_pretrained /
generate + the inference solvers, SURVEY.md §1 L4-L5).  A session owns the
parameter pytrees and compiled engines and exposes:

- ``generate(prompt_or_label, ...)`` -> (tokens, stats)
- ``decode_ids(tokens)`` -> image array (via the JAX VQ-GAN)

Sessions are cheap dataclass wrappers; all compute lives in the pure engine
functions, so multi-request scheduling and sharding compose on top.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import trees
from ..configs import DrafterConfig, ModelConfig
from ..models import drafter as drf
from ..models import transformer as tfm
from ..models import vqgan
from ..ops.acceptance import LanternSpec
from ..ops.sampling import LogitsWarp
from . import ar, spec


@dataclasses.dataclass
class GenStats:
    step_compression: float
    latency: float
    steps: int
    tokens: int


@dataclasses.dataclass
class LlamaGenSession:
    cfg: ModelConfig
    dcfg: Optional[DrafterConfig]
    params: dict
    dparams: Optional[dict]
    vq_cfg: Optional[vqgan.VQGANConfig] = None
    vq_params: Optional[dict] = None
    t5: object = None
    # drafter is the hidden-passthrough: spec steps run drafter-free stale-
    # distribution drafting (SpecDecodeConfig.stale_draft, bit-identical but
    # skips all drafter forwards + per-level lm_head streams)
    passthrough_drafter: bool = False

    def _resolve_stale(self, stale_draft, mode: str) -> bool:
        if stale_draft == "auto":
            return mode == "static" and self.passthrough_drafter
        return bool(stale_draft) and mode == "static"

    @classmethod
    def from_pretrained(
        cls,
        base_path: str,
        cfg: ModelConfig,
        drafter_path: Optional[str] = None,
        dcfg: Optional[DrafterConfig] = None,
        vq_path: Optional[str] = None,
        nearest_path: Optional[str] = None,
        t5_dir: Optional[str] = None,
    ) -> "LlamaGenSession":
        from ..utils import checkpoint as ckpt
        from ..ops.vq_distance import load_table

        sd = ckpt.load_torch_dir(base_path)
        params = ckpt.llamagen_params_from_torch(sd, cfg)
        dparams = None
        if drafter_path is not None:
            if dcfg is None:
                dcfg = DrafterConfig(model=cfg)
            dsd = ckpt.load_torch_dir(drafter_path)
            dparams = ckpt.drafter_params_from_torch(dsd, dcfg, embed=params["embed"])
        vq_cfg = vq_params = None
        if vq_path is not None:
            vq_cfg = vqgan.vq16_config(codebook_size=cfg.vocab_size)
            vq_params = vqgan.load_torch_state_dict(ckpt.load_torch_file(vq_path), vq_cfg)
        if nearest_path is not None:
            params["nearest_latents"] = jnp.asarray(load_table(nearest_path))
        sess = cls(cfg=cfg, dcfg=dcfg, params=params, dparams=dparams,
                   vq_cfg=vq_cfg, vq_params=vq_params)
        if t5_dir is not None:
            from ..utils.t5 import T5Embedder

            sess.t5 = T5Embedder(t5_dir)
        return sess

    @classmethod
    def random(
        cls,
        cfg: ModelConfig,
        dcfg: Optional[DrafterConfig] = None,
        seed: int = 0,
        with_vq: bool = True,
        aligned_drafter: bool = True,
    ) -> "LlamaGenSession":
        """Random-weight session for smoke tests / benches (no public
        checkpoints in this environment)."""
        params = tfm.init_params(jax.random.key(seed), cfg)
        dparams = None
        if dcfg is not None:
            dparams = drf.init_drafter_params(
                jax.random.key(seed + 1), dcfg, params["embed"]
            )
            if aligned_drafter:
                H = cfg.hidden_size
                fc = np.zeros((2 * H, H), np.float32)
                fc[H:] = np.eye(H)   # hidden-passthrough: input is [embed, hidden]
                dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
                dparams["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])
        vq_cfg = vq_params = None
        if with_vq:
            vq_cfg = vqgan.vq16_config(codebook_size=cfg.vocab_size)
            vq_params = vqgan.init_vqgan_params(jax.random.key(seed + 2), vq_cfg)
        return cls(cfg=cfg, dcfg=dcfg, params=params, dparams=dparams,
                   vq_cfg=vq_cfg, vq_params=vq_params,
                   passthrough_drafter=aligned_drafter and dcfg is not None)

    # ------------------------------------------------------------------
    def _cond_pair(self, prompt):
        cfg = self.cfg
        if cfg.cond_kind == "label":
            cond = jnp.asarray([int(prompt)])
            uncond = jnp.asarray([cfg.num_classes])
            return cond, uncond, None
        # caption: T5 -> flip/zero pads (modeling_llamagen_kv.py:1387-1397)
        from ..utils.t5 import RandomT5, flip_for_left_padding

        t5 = self.t5 or RandomT5(dim=cfg.caption_dim, model_max_length=cfg.cls_token_num)
        emb, mask = t5.get_text_embeddings([str(prompt)])
        emb, mask = flip_for_left_padding(emb, mask)
        cond = jnp.asarray(emb)
        uncond = jnp.asarray(self.params["cond"]["uncond"])[None].astype(cond.dtype)
        S = self.cfg.max_seq_len
        pv = np.ones((2, S), bool)
        pv[:, : cfg.cls_token_num] = mask.astype(bool)
        return cond, uncond, jnp.asarray(pv)

    def generate(
        self,
        prompt,
        max_new: Optional[int] = None,
        temperature: float = 1.0,
        top_k: int = 2000,
        top_p: float = 1.0,
        drafter_top_k: Optional[int] = None,
        cfg_scale: float = 7.5,
        mode: str = "static",            # "static" | "dynamic" | "ar"
        tree: str = "naive_extend_57",
        lantern_k: int = 0,
        lantern_delta: float = 0.0,
        seed: int = 0,
        kv_quant: bool = False,
        warp_order: str = "hf",   # "ar" = reference vanilla-AR order
        stale_draft="auto",       # drafter-free stale drafting; "auto" = on
        #   when the session's drafter is the hidden-passthrough
    ):
        cfg = self.cfg
        max_new = max_new or cfg.block_size
        warp = LogitsWarp(temperature=temperature, top_k=top_k, top_p=top_p,
                          warp_order=warp_order)
        cond, uncond, pv = self._cond_pair(prompt)
        rng = jax.random.key(seed)
        t0 = time.perf_counter()
        if mode == "ar" or self.dparams is None:
            res = ar.generate(self.params, cfg, cond, uncond, max_new,
                              cfg_scale, warp, rng, prefix_valid=pv,
                              kv_quant=kv_quant)
            jax.block_until_ready(res.tokens)
            dt = time.perf_counter() - t0
            toks = np.asarray(res.tokens)
            return toks, GenStats(1.0, dt, max_new, max_new)

        dwarp = (None if drafter_top_k is None else
                 dataclasses.replace(warp, top_k=drafter_top_k))
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=cfg_scale,
            lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
            max_new=max_new, mode=mode, kv_quant=kv_quant,
            drafter_warp=dwarp,
            stale_draft=self._resolve_stale(stale_draft, mode),
        )
        if tree == "auto":
            tree = "naive_extend_57"
        tspec = trees.get_tree(tree) if mode == "static" else None
        res = spec.generate(
            self.params, self.dparams, ecfg, cfg, self.dcfg, tspec,
            cond, uncond, rng, prefix_valid=pv,
        )
        jax.block_until_ready(res.tokens)
        dt = time.perf_counter() - t0
        toks = np.asarray(res.tokens)[:max_new]
        sc = float(res.accept_sum) / max(1.0, float(res.steps))
        return toks, GenStats(sc, dt, int(res.steps), max_new)

    def generate_batch(
        self,
        prompts,
        slots: int = 8,
        max_new: Optional[int] = None,
        temperature: float = 1.0,
        top_k: int = 2000,
        top_p: float = 1.0,
        drafter_top_k: Optional[int] = None,
        cfg_scale: float = 7.5,
        mode: str = "static",
        tree: str = "naive_extend_57",
        lantern_k: int = 0,
        lantern_delta: float = 0.0,
        seed: int = 0,
        kv_quant: bool = False,
        warp_order: str = "hf",
        progress: bool = False,
        stale_draft="auto",
    ):
        """Continuous-batching generation over many prompts: ``slots``
        concurrent requests share every weight stream (the serving-engine
        multiplier the reference gets from vLLM,
        vllm_inference_solver.py:243-343).  Returns the scheduler's Request
        list (tokens / steps / accept_sum / latency / error per prompt, in
        input order); failed requests carry ``error`` and the batch keeps
        serving.

        ``mode="ar"`` runs lockstep-vmapped vanilla AR (``ar.generate_many``)
        — image generation is fixed-length, so that IS continuous batching.
        ``tree="auto"`` picks the draft shape by slot count: speculation's
        per-token FLOP multiplier turns against it as the batch grows
        (measured crossover on v5e at XL geometry, PERF.md), so large
        batches get small chain-heavy trees."""
        from .batch import BatchedEngine
        from .scheduler import Request, Scheduler

        cfg = self.cfg
        max_new = max_new or cfg.block_size
        warp = LogitsWarp(temperature=temperature, top_k=top_k, top_p=top_p,
                          warp_order=warp_order)
        if tree == "auto" and mode == "static" and self.dparams is not None:
            # measured speculation-vs-batching crossover (engine/policy.py):
            # big slot counts amortize the weight stream by themselves, and
            # past the crossover plain batched AR wins
            from .policy import serving_plan

            pmode, ptree = serving_plan(slots)
            if pmode == "ar":
                mode = "ar"
            else:
                tree = ptree
        elif tree == "auto":
            tree = "naive_extend_57" if slots < 4 else "chain_bush_8"
        if mode == "ar" or self.dparams is None:
            return self._generate_batch_ar(prompts, slots, max_new, cfg_scale,
                                           warp, seed, kv_quant)
        dwarp = (None if drafter_top_k is None else
                 dataclasses.replace(warp, top_k=drafter_top_k))
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=cfg_scale,
            lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
            max_new=max_new, mode=mode, kv_quant=kv_quant,
            drafter_warp=dwarp,
            stale_draft=self._resolve_stale(stale_draft, mode),
        )
        tspec = trees.get_tree(tree) if mode == "static" else None
        engine = BatchedEngine(ecfg, cfg, self.dcfg, tspec, self.params,
                               self.dparams, num_slots=min(slots, len(prompts)))
        reqs = []
        for i, p in enumerate(prompts):
            try:
                cond, uncond, pv = self._cond_pair(p)
                reqs.append(Request(uid=i, cond=cond, uncond=uncond,
                                    prefix_valid=pv, seed=seed + i))
            except Exception as e:  # noqa: BLE001 — bad prompt, keep serving
                reqs.append(Request(uid=i, seed=seed + i,
                                    error=f"{type(e).__name__}: {e}"))
        return Scheduler(engine).run(reqs, progress=progress)

    def _generate_batch_ar(self, prompts, slots, max_new, cfg_scale, warp,
                           seed, kv_quant):
        """Lockstep batched AR over prompt chunks (ar.generate_many)."""
        import time as _time

        from . import ar as _ar
        from .scheduler import Request

        out = []
        for lo in range(0, len(prompts), max(1, slots)):
            chunk = list(range(lo, min(lo + slots, len(prompts))))
            good, conds, pvs, uncond = [], [], [], None
            for i in chunk:
                try:
                    c, uncond, pv = self._cond_pair(prompts[i])
                    good.append(i)
                    conds.append(c)
                    pvs.append(pv)
                except Exception as e:  # noqa: BLE001
                    out.append(Request(uid=i, seed=seed + i,
                                       error=f"{type(e).__name__}: {e}"))
            if not good:
                continue
            t0 = _time.perf_counter()
            rngs = jax.vmap(jax.random.key)(
                jnp.asarray([seed + i for i in good], jnp.uint32))
            pv_b = None if pvs[0] is None else jnp.stack(pvs)
            toks = np.asarray(_ar.generate_many(
                self.params, self.cfg, jnp.stack(conds), uncond, max_new,
                cfg_scale, warp, rngs, prefix_valid=pv_b, kv_quant=kv_quant))
            dt = _time.perf_counter() - t0
            for row, i in enumerate(good):
                out.append(Request(uid=i, seed=seed + i, tokens=toks[row],
                                   steps=max_new, accept_sum=max_new,
                                   latency=dt))
        out.sort(key=lambda r: r.uid)
        return out

    def decode_ids(self, tokens: np.ndarray) -> np.ndarray:
        """VQ codes [T] or [B, T] -> uint8 image array [B, H, W, 3]."""
        if self.vq_params is None:
            raise ValueError("session has no VQ codec loaded")
        toks = jnp.asarray(np.atleast_2d(tokens))
        grid = int(round(toks.shape[1] ** 0.5))
        img = vqgan.decode_code(self.vq_params, self.vq_cfg, toks, grid)
        img = np.asarray(img)
        return (np.clip((img + 1.0) / 2.0, 0, 1) * 255).astype(np.uint8)


@dataclasses.dataclass
class ChameleonSession:
    """Anole / Lumina-mGPT generation session.

    Prompts are raw text (tokenized with the checkpoint's Chameleon BPE,
    ``models/bpe.ChameleonBPE``) or pre-tokenized BPE id lists.  Generated
    image tokens translate to VQ codes by the image-token offset.
    """

    cfg: ModelConfig
    dcfg: Optional[DrafterConfig]
    params: dict
    dparams: Optional[dict]
    family: str = "anole"            # "anole" | "lumina"
    grid: tuple = (32, 32)           # (h, w) latent grid (anole 512px: 32x32)
    vq_cfg: Optional[vqgan.VQGANConfig] = None   # Chameleon (taming) VQGAN
    vq_params: Optional[dict] = None
    fsm_overrides: Optional[dict] = None  # LuminaGridFSM id overrides
    #   (newline_id / image_end_id / image_lo / image_hi — small-vocab tests)
    tokenizer: object = None         # ChameleonBPE (or any str -> List[int])
    # drafter is the hidden-passthrough: spec steps run drafter-free stale-
    # distribution drafting (SpecDecodeConfig.stale_draft)
    passthrough_drafter: bool = False

    _resolve_stale = LlamaGenSession._resolve_stale

    @classmethod
    def from_pretrained(
        cls,
        base_path: str,
        cfg: ModelConfig,
        drafter_path: Optional[str] = None,
        dcfg: Optional[DrafterConfig] = None,
        vq_path: Optional[str] = None,
        nearest_path: Optional[str] = None,
        family: str = "anole",
        grid=(32, 32),
        tokenizer_path: Optional[str] = None,
    ) -> "ChameleonSession":
        """Load HF Chameleon-family checkpoints (Anole-7b / Lumina-mGPT) +
        optional EAGLE drafter, taming VQGAN, LANTERN nearest table, and the
        checkpoint's BPE tokenizer (searched under ``base_path`` when
        ``tokenizer_path`` is not given; missing files just disable raw-text
        prompts)."""
        from ..models import chameleon as cham
        from ..models.bpe import ChameleonBPE, load_tokenizer
        from ..ops.vq_distance import load_table
        from ..utils import checkpoint as ckpt

        sd = ckpt.load_torch_dir(base_path)
        params = ckpt.chameleon_params_from_torch(sd, cfg)
        if tokenizer_path is not None:
            tokenizer = load_tokenizer(tokenizer_path)
        else:
            try:
                tokenizer = ChameleonBPE.from_checkpoint_dir(base_path)
            except FileNotFoundError:
                tokenizer = None
        dparams = None
        if drafter_path is not None:
            if dcfg is None:
                dcfg = DrafterConfig(model=cfg)
            dsd = ckpt.load_torch_dir(drafter_path)
            dparams = ckpt.drafter_params_from_torch(dsd, dcfg,
                                                     embed=params["embed"])
        sess = cls(cfg=cfg, dcfg=dcfg, params=params, dparams=dparams,
                   family=family, grid=grid, tokenizer=tokenizer)
        if vq_path is not None:
            sess.vq_cfg = vqgan.chameleon_vq_config()
            sess.vq_params = vqgan.load_taming_state_dict(
                ckpt.load_torch_file(vq_path), sess.vq_cfg)
        if nearest_path is not None:
            table = load_table(nearest_path)
            params["nearest_latents"] = jnp.asarray(
                cham.shift_nearest_table(np.asarray(table), cfg.vocab_size))
        return sess

    @property
    def item_processor(self):
        from ..models.item_processor import FlexARItemProcessor

        return FlexARItemProcessor(vq_params=self.vq_params,
                                   vq_cfg=self.vq_cfg,
                                   tokenizer=self.tokenizer)

    def decode_ids(self, tokens):
        """Generated stream -> (text token spans, decoded uint8 images)
        (reference inference_solver.py:474-499)."""
        return self.item_processor.decode_ids(list(np.asarray(tokens)))

    def decode_generated(self, tokens, grid=None) -> np.ndarray:
        """Raw ``generate()`` output (no image start/end wrappers) -> one
        uint8 image.  Anole emits exactly h*w image BPE ids; Lumina emits
        grid rows with per-row newline tokens and a trailing image-end."""
        from ..models import chameleon as cham

        if self.vq_params is None:
            raise ValueError("session has no VQ codec loaded")
        h, w = grid or self.grid
        toks = np.asarray(tokens).reshape(-1)
        if self.family == "lumina":
            body = toks[: h * (w + 1)].reshape(h, w + 1)[:, :w]
        else:
            body = toks[: h * w].reshape(h, w)
        codes = cham.bpe_to_img(body)
        px = vqgan.decode_code(self.vq_params, self.vq_cfg,
                               jnp.asarray(codes.reshape(1, -1)), grid=(h, w))
        arr = np.asarray(px)[0]
        return np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)

    def generate_batch(
        self,
        prompts,
        slots: int = 8,
        max_new: Optional[int] = None,
        temperature: float = 1.0,
        top_k: int = 2000,
        top_p: float = 1.0,
        drafter_top_k: Optional[int] = None,
        cfg_scale: float = 3.0,
        mode: str = "static",
        tree: str = "mc_sim_7b_63",
        lantern_k: int = 0,
        lantern_delta: float = 0.0,
        seed: int = 0,
        kv_quant: bool = False,
        warp_order: str = "hf",
        progress: bool = False,
        grid=None,
        stale_draft="auto",
    ):
        """Continuous-batching generation over token/text prompts (the
        reference's vLLM data-gen role, vllm_inference_solver.py:243-343).
        Prompt lengths may differ freely — Lumina's grid FSM receives each
        slot's image-start index as a traced per-slot value (ragged batching,
        matching vllm_inference_solver.py:296-306); each distinct prompt
        length compiles one extra prefill but shares the step program.
        Returns scheduler Requests in input order; failures carry ``error``
        and the batch keeps serving."""
        from ..models import chameleon as cham
        from .batch import BatchedEngine
        from .scheduler import Request, Scheduler

        if mode == "ar" or self.dparams is None:
            warp = LogitsWarp(temperature=temperature, top_k=top_k,
                              top_p=top_p, warp_order=warp_order)
            return self._generate_batch_ar_tokens(
                prompts, slots, max_new, cfg_scale, warp, seed, kv_quant,
                grid)
        cfg = self.cfg
        h, w = grid or self.grid
        if max_new is None:
            max_new = h * w if self.family == "anole" else h * (w + 1) + 1
        warp = LogitsWarp(temperature=temperature, top_k=top_k, top_p=top_p,
                          warp_order=warp_order)
        dwarp = (None if drafter_top_k is None else
                 dataclasses.replace(warp, top_k=drafter_top_k))
        reqs = []
        lens = set()
        for i, p in enumerate(prompts):
            try:
                tp = self._prompt(p, grid=grid)
                lens.add(int(tp.tokens.shape[1]))
                reqs.append(Request(uid=i, token_prompt=tp, seed=seed + i))
            except Exception as e:  # noqa: BLE001
                reqs.append(Request(uid=i, seed=seed + i,
                                    error=f"{type(e).__name__}: {e}"))
        if tree == "auto":
            # measured crossover table (engine/policy.py): 7B token-prompt
            # geometry is KV-bound, so speculation survives to much larger
            # slot counts than at XL
            from .policy import serving_plan

            pmode, ptree = serving_plan(slots, geometry="lumina_7b")
            if pmode == "ar":
                return self._generate_batch_ar_tokens(
                    prompts, slots, max_new, cfg_scale, warp, seed, kv_quant,
                    grid)
            tree = ptree
            if tree == "calibrated":
                import os as _os

                sel = _os.path.join(_os.path.dirname(_os.path.dirname(
                    _os.path.dirname(_os.path.abspath(__file__)))),
                    "ckpts/bench_tree_lumina.json")
                tree = sel if _os.path.exists(sel) else "chain_bush_8"
        mask = jnp.asarray(cham.non_image_token_mask(cfg.vocab_size))
        logits_fn = None
        if self.family == "lumina" and lens:
            # prompt lengths may differ across slots: the engine binds each
            # slot's image-start index (its uncond position offset) into the
            # FSM as a traced override (spec.bind_logits_fn), so the static
            # field here is only a fallback default
            logits_fn = cham.LuminaGridFSM(
                w=w, h=h, image_start_idx=max(lens) - 3,
                vocab_size=cfg.vocab_size, **(self.fsm_overrides or {}),
            )
            mask = None
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=cfg_scale,
            lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
            max_new=max_new, mode=mode, kv_quant=kv_quant,
            drafter_warp=dwarp,
            stale_draft=self._resolve_stale(stale_draft, mode),
        )
        tspec = trees.get_tree(tree) if mode == "static" else None
        engine = BatchedEngine(ecfg, cfg, self.dcfg, tspec, self.params,
                               self.dparams, num_slots=min(slots, len(prompts)),
                               logits_mask=mask, logits_fn=logits_fn)
        return Scheduler(engine).run(reqs, progress=progress)

    def _generate_batch_ar_tokens(self, prompts, slots, max_new, cfg_scale,
                                  warp, seed, kv_quant, grid=None):
        """Lockstep batched AR over token prompts, bucketed by prompt length
        (ar.generate_tokens_many — the reference's vLLM data-gen role for
        Chameleon models, vllm_inference_solver.py:243-343)."""
        import time as _time

        from ..models import chameleon as cham
        from . import ar as _ar
        from .scheduler import Request

        cfg = self.cfg
        h, w = grid or self.grid
        if max_new is None:
            max_new = h * w if self.family == "anole" else h * (w + 1) + 1
        out = []
        built = []
        for i, p in enumerate(prompts):
            try:
                built.append((i, self._prompt(p, grid=grid)))
            except Exception as e:  # noqa: BLE001
                out.append(Request(uid=i, seed=seed + i,
                                   error=f"{type(e).__name__}: {e}"))
        by_len = {}
        for i, tp in built:
            by_len.setdefault(int(tp.tokens.shape[1]), []).append((i, tp))
        for L, group in sorted(by_len.items()):
            mask = jnp.asarray(cham.non_image_token_mask(cfg.vocab_size))
            logits_fn = None
            if self.family == "lumina":
                logits_fn = cham.LuminaGridFSM(
                    w=w, h=h, image_start_idx=L - 3,
                    vocab_size=cfg.vocab_size, **(self.fsm_overrides or {}))
                mask = None
            for lo in range(0, len(group), max(1, slots)):
                chunk = group[lo: lo + max(1, slots)]
                tpb = spec.TokenPrompt(
                    tokens=jnp.stack([tp.tokens for _, tp in chunk]),
                    positions=jnp.stack([tp.positions for _, tp in chunk]),
                    valid=jnp.stack([tp.valid for _, tp in chunk]),
                    pos_diff=jnp.stack([tp.pos_diff for _, tp in chunk]),
                )
                rngs = jax.vmap(jax.random.key)(
                    jnp.asarray([seed + i for i, _ in chunk], jnp.uint32))
                t0 = _time.perf_counter()
                toks, _nv = _ar.generate_tokens_many(
                    self.params, cfg, tpb, max_new, cfg_scale, warp, rngs,
                    logits_mask=mask, logits_fn=logits_fn, kv_quant=kv_quant)
                toks = np.asarray(toks)
                dt = _time.perf_counter() - t0
                for row, (i, _) in enumerate(chunk):
                    out.append(Request(uid=i, seed=seed + i,
                                       tokens=toks[row], steps=max_new,
                                       accept_sum=max_new, latency=dt))
        out.sort(key=lambda r: r.uid)
        return out

    @classmethod
    def random(cls, cfg: ModelConfig, dcfg: Optional[DrafterConfig] = None,
               seed: int = 0, family: str = "anole", grid=(8, 8),
               aligned_drafter: bool = True) -> "ChameleonSession":
        from ..models.item_processor import hash_tokenize

        params = tfm.init_params(jax.random.key(seed), cfg)
        dparams = None
        if dcfg is not None:
            dparams = drf.init_drafter_params(
                jax.random.key(seed + 1), dcfg, params["embed"]
            )
            if aligned_drafter:
                H = cfg.hidden_size
                fc = np.zeros((2 * H, H), np.float32)
                fc[H:] = np.eye(H)   # hidden-passthrough: input is [embed, hidden]
                dparams["fc_w"] = jnp.asarray(fc, dtype=cfg.jnp_dtype)
                dparams["layers"] = jax.tree.map(lambda a: a * 0, dparams["layers"])
        return cls(cfg=cfg, dcfg=dcfg, params=params, dparams=dparams,
                   family=family, grid=grid, tokenizer=hash_tokenize,
                   passthrough_drafter=aligned_drafter and dcfg is not None)

    def _prompt(self, text_or_tokens, grid=None):
        from ..models import chameleon as cham

        if isinstance(text_or_tokens, str):
            if self.tokenizer is None:
                raise ValueError(
                    "raw-text prompts need a tokenizer — pass tokenizer_path "
                    "to from_pretrained (the tokenizer json ships inside "
                    "every Anole/Lumina checkpoint) or set .tokenizer")
            text_tokens = list(self.tokenizer(text_or_tokens))
        else:
            text_tokens = list(text_or_tokens)
        if self.family == "anole":
            return cham.anole_token_prompt(text_tokens)
        return cham.lumina_token_prompt(text_tokens, grid=grid or self.grid)

    def generate(
        self,
        text_tokens,
        max_new: Optional[int] = None,
        temperature: float = 1.0,
        top_k: int = 2000,
        top_p: float = 1.0,
        drafter_top_k: Optional[int] = None,
        cfg_scale: float = 3.0,
        mode: str = "static",
        tree: str = "mc_sim_7b_63",
        lantern_k: int = 0,
        lantern_delta: float = 0.0,
        seed: int = 0,
        kv_quant: bool = False,
        warp_order: str = "hf",   # "ar" = reference vanilla-AR order
        stop_ids=None,            # EOS-terminated interleaved generation
        logits_fn="auto",         # custom logits processor; "auto" = family
        stale_draft="auto",       # drafter-free stale drafting; "auto" = on
        #   when the session's drafter is the hidden-passthrough
        grid=None,                # per-call (h, w) latent grid override
        #   (Lumina multi-resolution: reference target_size,
        #   eagle_inference_solver.py:244; each grid compiles once)
    ):
        """Generate one stream.  Default mode is fixed-budget image
        generation (non-image tokens suppressed / grid FSM enforced).

        ``stop_ids`` (e.g. ``(8710,)``) switches to EOS-terminated
        VARIABLE-LENGTH generation: logits run unconstrained (text and image
        tokens both flow, so the model can interleave spans — the reference
        solver loop's behavior with ``eos_token_id=[8710]``,
        inference_solver.py:441), the engine stops once a stop id commits,
        and the returned stream is truncated one past it.  Feed the result
        to ``decode_ids`` to split text spans and decode the image spans
        (inference_solver.py:474-499)."""
        from ..models import chameleon as cham

        cfg = self.cfg
        h, w = grid or self.grid
        if max_new is None:
            max_new = h * w if self.family == "anole" else h * (w + 1) + 1
        warp = LogitsWarp(temperature=temperature, top_k=top_k, top_p=top_p,
                          warp_order=warp_order)
        tp = self._prompt(text_tokens, grid=grid)
        stop_ids = tuple(stop_ids) if stop_ids else ()
        mask = (None if stop_ids else
                jnp.asarray(cham.non_image_token_mask(cfg.vocab_size)))
        if logits_fn == "auto":
            logits_fn = None
            if self.family == "lumina" and not stop_ids:
                logits_fn = cham.LuminaGridFSM(
                    w=w, h=h, image_start_idx=int(tp.pos_diff),
                    vocab_size=cfg.vocab_size, **(self.fsm_overrides or {}),
                )
        if logits_fn is not None:
            mask = None  # the processor subsumes the static suppress mask
        t0 = time.perf_counter()
        if mode == "ar" or self.dparams is None:
            res = ar.generate_tokens(
                self.params, cfg, tp, max_new, cfg_scale, warp,
                jax.random.key(seed), logits_mask=mask, logits_fn=logits_fn,
                kv_quant=kv_quant, stop_ids=stop_ids,
            )
            jax.block_until_ready(res.tokens)
            dt = time.perf_counter() - t0
            toks = np.asarray(res.tokens)
            if stop_ids:
                toks = toks[: int(res.n_valid)]
            return toks, GenStats(1.0, dt, len(toks), len(toks))
        dwarp = (None if drafter_top_k is None else
                 dataclasses.replace(warp, top_k=drafter_top_k))
        ecfg = spec.SpecDecodeConfig(
            warp=warp, cfg_scale=cfg_scale,
            lantern=LanternSpec(k=lantern_k, delta=lantern_delta),
            max_new=max_new, mode=mode, kv_quant=kv_quant,
            drafter_warp=dwarp, stop_ids=stop_ids,
            stale_draft=self._resolve_stale(stale_draft, mode),
        )
        if tree == "auto":
            tree = "mc_sim_7b_63"
        tspec = trees.get_tree(tree) if mode == "static" else None
        res = spec.generate(
            self.params, self.dparams, ecfg, cfg, self.dcfg, tspec,
            None, None, jax.random.key(seed),
            token_prompt=tp, logits_mask=mask, logits_fn=logits_fn,
        )
        jax.block_until_ready(res.tokens)
        dt = time.perf_counter() - t0
        n_out = int(res.n_valid) if stop_ids else max_new
        toks = np.asarray(res.tokens)[:n_out]
        sc = float(res.accept_sum) / max(1.0, float(res.steps))
        return toks, GenStats(sc, dt, int(res.steps), n_out)
