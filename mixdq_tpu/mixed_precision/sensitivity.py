"""Per-layer sensitivity sweeps, metric-decoupled.

Reference: mixed_precision_scripts/get_sensitivity/sdxl_turbo/
{quant_content,quant_quality}.py — for every (layer, bit) pair, quantize
*only that layer* and measure either

* SQNR of the UNet output vs saved FP outputs ("quality" layers — all
  except ff/attn2, quant_quality.py:53-84, 275-301), or
* SSIM of generated images vs FP reference images ("content" layers —
  names containing ``ff`` or ``attn2``, quant_content.py:193-251).

The reference re-runs Python module surgery per (layer, bit); here the
per-layer controls are jit *arguments* (solo_layer_ctrl), so the whole
sweep reuses ONE compiled UNet — |layers| x |bits| device calls. The
batched sweeps additionally accept a ``mesh``: sweep points are a batch
axis, so sharding the (layer, bit) index vectors over ``dp`` while
params/qparams ride replicated data-parallelizes the sweep across the
slice with zero algorithm change (each point's compute is untouched —
results match the single-device path).
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..quant.state import QuantCtx, group_ctrl
from ..utils.metrics import sqnr, ssim

logger = logging.getLogger(__name__)


def split_metric_groups(names: Iterable[str]) -> Tuple[List[str], List[str]]:
    """(content, quality) split: ff/attn2 layers are 'content'
    (quant_content.py main loop; mixed_precision_search.md)."""
    content, quality = [], []
    for n in names:
        if ".ff." in n or ".attn2." in n:
            content.append(n)
        else:
            quality.append(n)
    return content, quality


def sweep_sqnr(
    model,
    variables,
    qparams,
    layer_names: Sequence[str],
    all_names: Sequence[str],
    calib_batch: Tuple,
    fp_outputs: jnp.ndarray,
    wq,
    aq,
    which: str = "weight",
    bits: Sequence[int] = (2, 4, 8),
) -> Dict[str, List[float]]:
    """SQNR sensitivity for each (layer, bit): higher = less sensitive."""

    # variables/qparams/fp_outputs ride as jit ARGS, not closure
    # constants — closing over them captures multi-GB params into the
    # lowered program (slow lowering, doubled HBM)
    @jax.jit
    def run(variables, qparams, fp_outputs, ctrl, *batch):
        ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake", wq=wq, aq=aq)
        out = model.apply(variables, *batch, ctx)
        return sqnr(fp_outputs, out)

    out: Dict[str, List[float]] = {}
    for li, name in enumerate(layer_names):
        vals = []
        for b in bits:
            # exact layer name or block prefix (group/block-granularity
            # sweeps, the reference's SSIM_Group/SSIM_Lower_Block,
            # analysis_tools quant_content.py:212-281)
            ctrl = group_ctrl(all_names, [name], which, b,
                              candidate_bits=wq.candidate_bits)
            vals.append(float(run(variables, qparams, fp_outputs, ctrl,
                                  *calib_batch)))
        out[name] = vals
        if li % 20 == 0:
            logger.info("sqnr sweep %d/%d %s -> %s", li, len(layer_names),
                        name, [f"{v:.1f}" for v in vals])
    return out


def sweep_sqnr_batched(
    model,
    variables,
    qparams,
    layer_names: Sequence[str],
    all_names: Sequence[str],
    calib_batch: Tuple,
    fp_outputs: jnp.ndarray,
    wq,
    aq,
    which: str = "weight",
    bits: Sequence[int] = (2, 4, 8),
    chunk: int = 8,
    mesh=None,
) -> Dict[str, List[float]]:
    """Vectorized sweep: stacks ``chunk`` (layer, bit) control configs and
    evaluates them in ONE vmapped forward — the controls are pytree data,
    so sweep points become a batch axis (TPU-idiomatic replacement for the
    reference's |layers| x |bits| sequential full runs,
    quant_quality.py:275-301). Memory scales with ``chunk``.

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``dp`` axis — the
    point index vectors shard over dp (chunk rounds up to a dp multiple)
    and params/qparams/calib ride replicated, so the chunk's points run
    dp-way data-parallel. Per-point compute is unchanged, so results
    match the single-device sweep."""
    points = [(n, b) for n in layer_names for b in bits]
    names = list(all_names)
    pos = {n: j for j, n in enumerate(names)}
    unknown = [n for n in layer_names if n not in pos]
    if unknown:
        raise KeyError(
            "sweep_sqnr_batched takes exact layer names only (no prefix "
            f"targets — use sweep_sqnr for those); unknown: {unknown[:5]}")
    cb = list(wq.candidate_bits)
    bad_bits = [b for b in bits if b not in cb]
    if bad_bits:
        raise ValueError(
            f"sweep bits {bad_bits} not in candidate_bits {cb} — no "
            "calibrated qparams exist for them")
    bit_idx = jnp.asarray([cb.index(b) for b in bits], jnp.int32)
    is_w = which in ("weight", "both")
    is_a = which in ("act", "both")

    from ..quant.state import LayerCtrl

    # The sweep-point ctrl pytree is built INSIDE jit from two scalars
    # (layer index, bit index) — shipping a per-name LayerCtrl dict as a
    # jit argument per chunk costs |layers| x 4 tiny device transfers
    # (~3200 puts, ~35 s/chunk over the remote-TPU tunnel); this form
    # costs two. variables/qparams/fp_outputs ride as jit args, not
    # closure constants (multi-GB lowering otherwise).
    def _run_chunk(variables, qparams, fp_outputs, li, bi, *batch):
        def one(l, b):
            idx = bit_idx[b]
            z = jnp.int32(0)
            ctrl = {}
            for j, n in enumerate(names):
                on = l == j
                ctrl[n] = LayerCtrl(
                    w_on=jnp.logical_and(on, is_w),
                    a_on=jnp.logical_and(on, is_a),
                    w_idx=jnp.where(on, idx, z),
                    a_idx=jnp.where(on, idx, z))
            ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake",
                           wq=wq, aq=aq)
            out = model.apply(variables, *batch, ctx)
            return sqnr(fp_outputs, out)

        return jax.vmap(one)(li, bi)

    point_sharding = None
    if mesh is None:
        run_chunk = jax.jit(_run_chunk)
    else:
        # dp-parallel sweep via shard_map: each device runs the plain
        # single-device vmapped program on its chunk/dp local points
        # (params/qparams replicated, no collectives) — per-point
        # numerics are the single-device program's by construction,
        # unlike GSPMD propagation which repartitions the UNet body.
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        chunk = -(-chunk // dp) * dp  # round up to a dp multiple
        point_sharding = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        variables, qparams, fp_outputs, calib_batch = jax.device_put(
            (variables, qparams, fp_outputs, calib_batch), repl)

        def _spec_like(tree):
            return jax.tree_util.tree_map(lambda _: P(), tree)

        run_chunk = jax.jit(shard_map(
            _run_chunk, mesh=mesh,
            in_specs=(_spec_like(variables), _spec_like(qparams), P(),
                      P("dp"), P("dp"))
            + tuple(_spec_like(b) for b in calib_batch),
            out_specs=P("dp"), check_vma=False))

    vals: List[float] = []
    for i in range(0, len(points), chunk):
        grp = points[i : i + chunk]
        pad = grp + [grp[-1]] * (chunk - len(grp))  # single compiled shape
        li = jnp.asarray([pos[n] for n, _ in pad], jnp.int32)
        bi = jnp.asarray([bits.index(b) for _, b in pad], jnp.int32)
        if point_sharding is not None:
            li = jax.device_put(li, point_sharding)
            bi = jax.device_put(bi, point_sharding)
        out = run_chunk(variables, qparams, fp_outputs, li, bi,
                        *calib_batch)
        vals.extend([float(v) for v in out[: len(grp)]])
        logger.info("batched sqnr sweep %d/%d", min(i + chunk, len(points)),
                    len(points))

    res: Dict[str, List[float]] = {}
    for (n, b), v in zip(points, vals):
        res.setdefault(n, []).append(v)
    return res


def sweep_ssim_batched(
    pipe,
    params,
    qparams,
    layer_names: Sequence[str],
    all_names: Sequence[str],
    prompts: Sequence[str],
    key: jax.Array,
    wq,
    aq,
    which: str = "weight",
    bits: Sequence[int] = (2, 4, 8),
    num_steps: Optional[int] = None,
    ssim_win: int = 511,
    chunk: int = 4,
    mesh=None,
) -> Dict[str, List[float]]:
    """Vectorized SSIM content sweep: ``chunk`` (layer, bit) control
    points run through ONE vmapped pipeline program (denoise scan + VAE
    decode + SSIM all in-jit) — the content-sweep counterpart of
    ``sweep_sqnr_batched`` (the reference runs |layers| x 3 sequential
    full generations, quant_content.py:193-251). Exact layer names only;
    prefix targets go through ``sweep_ssim``. ``mesh``: optional dp mesh
    — sweep points shard over dp (see ``sweep_sqnr_batched``)."""
    from ..pipelines import samplers
    from ..quant.state import LayerCtrl

    points = [(n, b) for n in layer_names for b in bits]
    names = list(all_names)
    pos = {n: j for j, n in enumerate(names)}
    unknown = [n for n in layer_names if n not in pos]
    if unknown:
        raise KeyError(
            "sweep_ssim_batched takes exact layer names only (no prefix "
            f"targets — use sweep_ssim for those); unknown: {unknown[:5]}")
    cb = list(wq.candidate_bits)
    bad_bits = [b for b in bits if b not in cb]
    if bad_bits:
        raise ValueError(
            f"sweep bits {bad_bits} not in candidate_bits {cb} — no "
            "calibrated qparams exist for them")
    bit_idx = jnp.asarray([cb.index(b) for b in bits], jnp.int32)
    is_w = which in ("weight", "both")
    is_a = which in ("act", "both")

    f = pipe.family
    steps = num_steps or f.default_steps
    g = float(f.guidance_scale)
    B = len(prompts)
    H = f.unet.sample_size

    # stage setup mirrors Text2ImgPipeline.__call__ (one-time host work)
    tokens = jnp.asarray(pipe.tokenizer(list(prompts)))
    embeds, pooled = pipe._encode_jit(params, tokens)
    added = None
    if f.unet.addition_embed_type == "text_time":
        added = {"text_embeds": pooled,
                 "time_ids": pipe.default_time_ids(B, H * 8, H * 8)}
    neg_e, neg_a = None, None
    if g > 1.0:
        ntokens = jnp.asarray(pipe.tokenizer([""] * B))
        neg_e, neg_pooled = pipe._encode_jit(params, ntokens)
        if added is not None:
            neg_a = {"text_embeds": neg_pooled,
                     "time_ids": pipe.default_time_ids(B, H * 8, H * 8)}
    k_noise, k_lcm = jax.random.split(key)
    latents = jax.random.normal(k_noise, (B, H, H, f.unet.in_channels),
                                pipe.dtype)
    if f.is_sdxl:
        latents = latents * samplers.make_euler_schedule(steps).init_noise_sigma

    # FP reference images (same latents/key as the sweep points)
    fp = pipe(params, prompts, key, num_inference_steps=num_steps)
    fp_imgs = jnp.asarray(fp.images)
    win = min(ssim_win, fp_imgs.shape[1] - 1)
    if win % 2 == 0:
        win -= 1

    # ctrl pytrees are built INSIDE jit from two scalars per point (see
    # sweep_sqnr_batched for why); params/qparams/fp_imgs ride as jit args
    def _run_chunk(params, qparams, fp_imgs, li, bi, embeds, added, latents,
                   neg_e, neg_a, k):
        schedule = (samplers.make_euler_schedule(steps) if f.is_sdxl
                    else samplers.make_lcm_schedule(steps))

        def one(l, b):
            idx = bit_idx[b]
            z = jnp.int32(0)
            ctrl = {}
            for j, n in enumerate(names):
                on = l == j
                ctrl[n] = LayerCtrl(
                    w_on=jnp.logical_and(on, is_w),
                    a_on=jnp.logical_and(on, is_a),
                    w_idx=jnp.where(on, idx, z),
                    a_idx=jnp.where(on, idx, z))
            ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake",
                           wq=wq, aq=aq)
            lat, _ = pipe.sample_latents(params, embeds, added, latents,
                                         schedule, g, neg_e, neg_a, ctx,
                                         False, k)
            imgs = jnp.clip(pipe.vae.apply(
                {"params": params["vae"]}, lat, method="decode") / 2 + 0.5,
                0.0, 1.0)
            return jnp.mean(jax.vmap(
                lambda a, c: ssim(a, c, win_size=win))(fp_imgs, imgs))

        return jax.vmap(one)(li, bi)

    point_sharding = None
    if mesh is None:
        run_chunk = jax.jit(_run_chunk)
    else:
        # shard_map over dp (see sweep_sqnr_batched: each device runs the
        # plain single-device program on its local points — numerics match
        # the unsharded sweep by construction)
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp = mesh.shape["dp"]
        chunk = -(-chunk // dp) * dp
        point_sharding = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        (params, qparams, fp_imgs, embeds, added, latents, neg_e, neg_a,
         k_lcm) = jax.device_put(
            (params, qparams, fp_imgs, embeds, added, latents, neg_e,
             neg_a, k_lcm), repl)

        def _spec_like(tree):
            return jax.tree_util.tree_map(lambda _: P(), tree)

        run_chunk = jax.jit(shard_map(
            _run_chunk, mesh=mesh,
            in_specs=(_spec_like(params), _spec_like(qparams), P(),
                      P("dp"), P("dp"), P(), _spec_like(added), P(),
                      _spec_like(neg_e), _spec_like(neg_a), P()),
            out_specs=P("dp"), check_vma=False))

    vals: List[float] = []
    for i in range(0, len(points), chunk):
        grp = points[i : i + chunk]
        pad = grp + [grp[-1]] * (chunk - len(grp))  # single compiled shape
        li = jnp.asarray([pos[n] for n, _ in pad], jnp.int32)
        bi = jnp.asarray([bits.index(b) for _, b in pad], jnp.int32)
        if point_sharding is not None:
            li = jax.device_put(li, point_sharding)
            bi = jax.device_put(bi, point_sharding)
        out = run_chunk(params, qparams, fp_imgs, li, bi, embeds, added,
                        latents, neg_e, neg_a, k_lcm)
        vals.extend([float(v) for v in out[: len(grp)]])
        logger.info("batched ssim sweep %d/%d", min(i + chunk, len(points)),
                    len(points))

    res: Dict[str, List[float]] = {}
    for (n, b), v in zip(points, vals):
        res.setdefault(n, []).append(v)
    return res


def sweep_ssim(
    pipe,
    params,
    qparams,
    layer_names: Sequence[str],
    all_names: Sequence[str],
    prompts: Sequence[str],
    key: jax.Array,
    wq,
    aq,
    which: str = "weight",
    bits: Sequence[int] = (2, 4, 8),
    num_steps: Optional[int] = None,
    ssim_win: int = 511,
) -> Dict[str, List[float]]:
    """SSIM sensitivity: generate images with only one layer quantized and
    compare against the FP images (quant_content.py:218-251). Default
    win_size 511 matches the reference's near-global SSIM on 512px images
    (quant_content.py:324); smaller images clamp the window to H-1 (odd),
    same as the reference's win<=H validity constraint."""
    fp = pipe(params, prompts, key, num_inference_steps=num_steps)
    fp_imgs = jnp.asarray(fp.images)
    win = min(ssim_win, fp_imgs.shape[1] - 1)
    if win % 2 == 0:
        win -= 1

    # device-resident ctrl pieces, built once: per sweep point only the
    # target layer's LayerCtrl is swapped in, so the ctx that crosses
    # into jit carries no fresh host arrays (a full per-name ctrl dict
    # is ~3200 tiny device_puts per point over the remote-TPU tunnel)
    from ..quant.state import make_ctrl, uniform_ctrl
    base_ctrl = jax.device_put(uniform_ctrl(
        all_names, w_on=False, a_on=False,
        candidate_bits=wq.candidate_bits))
    on_ctrl = {b: jax.device_put(make_ctrl(
        w_on=(which in ("weight", "both")),
        a_on=(which in ("act", "both")), w_bits=b, a_bits=b,
        candidate_bits=wq.candidate_bits)) for b in bits}

    # exact name or dotted-prefix targets (group_ctrl semantics); unknown
    # targets raise instead of silently measuring an unquantized model
    expanded = {}
    for name in layer_names:
        hits = [n for n in all_names
                if n == name or n.startswith(name + ".")]
        if not hits:
            raise KeyError(
                f"sweep_ssim target {name!r} matches no layer (exact or "
                "dotted prefix) in all_names")
        expanded[name] = hits

    out: Dict[str, List[float]] = {}
    for li, name in enumerate(layer_names):
        vals = []
        for b in bits:
            ctrl = dict(base_ctrl)
            for n in expanded[name]:
                ctrl[n] = on_ctrl[b]
            ctx = QuantCtx(qparams=qparams, ctrl=ctrl, mode="fake",
                           wq=wq, aq=aq)
            q = pipe(params, prompts, key, num_inference_steps=num_steps,
                     ctx=ctx)
            q_imgs = jnp.asarray(q.images)
            s = jnp.mean(jnp.asarray(
                [ssim(fp_imgs[i], q_imgs[i], win_size=win)
                 for i in range(len(prompts))]))
            vals.append(float(s))
        out[name] = vals
        if li % 10 == 0:
            logger.info("ssim sweep %d/%d %s -> %s", li, len(layer_names),
                        name, [f"{v:.3f}" for v in vals])
    return out
