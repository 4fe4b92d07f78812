"""End-to-end detection pipeline: Gaussian pyramid -> Hessian response ->
keypoints -> top-K -> orientations -> descriptors.

TPU-native re-architecture of SiftPyramid::RunSIFT's template method
(SiftPyramid.cpp:53-198) + PyramidCU stage implementations. Differences by
design (SURVEY.md section 7):
  * the whole pipeline is one jitted function per static (H, W, octaves)
    bucket - no per-stage host round-trips (the reference does 4+ PCIe
    transfers per image, PyramidCU.cpp:720-924);
  * feature lists are fixed-capacity SoA arrays with validity masks instead
    of atomically-compacted textures;
  * global top-K selection is a threshold select over the concatenated
    response vector instead of an 850-line bitonic-sort subsystem
    (ProgramCU.cu:2205-3053);
  * multi-orientation expansion happens on device (the reference's
    ReshapeFeatureListCPU is a host round-trip, PyramidCU.cpp:720-924).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import (SiftConfig, TRUNCATE_KEEP_HIGHEST_LEVELS,
                     TRUNCATE_KEEP_LOWEST_LEVELS, TRUNCATE_TOP_K)
from .features import FeatureTable
from .ops import gaussian, hessian, keypoint, resize
from .ops.compaction import (FeatureList, _unpack_payload, compact_sorted,
                             compact_level_keypoints,
                             compact_octave_compressed,
                             compact_octave_compressed_packed,
                             compact_octave_keypoints,
                             compact_octave_maps_packed)
from .ops.descriptor import (compute_descriptors_flat,
                             descriptor_window_size)
from .ops.orientation import compute_orientations_flat

TWO_PI = 2.0 * math.pi


class PipelinePlan(NamedTuple):
    """Static shape plan for one (H, W) input bucket."""
    height: int
    width: int
    num_octaves: int
    octave_shapes: Tuple[Tuple[int, int], ...]
    level_caps: Tuple[int, ...]          # per (octave, key_level) capacity
    expanded_caps: Tuple[int, ...]       # after multi-orientation expansion


def make_plan(height: int, width: int, cfg: SiftConfig) -> PipelinePlan:
    """Compute the static octave/capacity layout for an input size.

    Mirrors SiftGPU::RunSIFT pyramid sizing: octaves until the smaller
    working dimension reaches min_dim (SiftPyramid.cpp:305-311), capped by
    num_octaves if set.
    """
    from .params import max_features_per_level, octave_shapes, required_octaves

    noct = required_octaves(min(height, width), cfg.min_dim)
    if cfg.num_octaves > 0:
        noct = min(noct, cfg.num_octaves)
    shapes = octave_shapes(height, width, noct)
    p = cfg.scale_params()

    caps = []
    ecaps = []
    for (h, w) in shapes:
        cap = max_features_per_level(h, w, cfg.max_feature_percent,
                                     cfg.max_level_features)
        ecap = (int(cap * 1.5) + 7) // 8 * 8
        for _ in p.key_levels:
            caps.append(cap)
            ecaps.append(ecap)
    return PipelinePlan(height, width, noct, tuple(shapes), tuple(caps),
                        tuple(ecaps))


# ---------------------------------------------------------------------------
# stage helpers
# ---------------------------------------------------------------------------

def _build_pyramid(img: jnp.ndarray, plan: PipelinePlan, cfg: SiftConfig,
                   detect_pad: bool = False):
    """Gaussian stacks for every octave. img: (H, W) f32 [0,1], or
    (B, H, W) - the batch rides the Pallas grids / conv batch dims, so one
    compiled program serves any B.

    Reference: PyramidCU::BuildPyramid (PyramidCU.cpp:1486-1558).
    On accelerators the separable convolutions run as Pallas kernels
    (ops/pallas/conv.py); XLA convolutions remain the CPU/reference path.

    detect_pad=True (pallas path only): kernel-sized octaves are emitted
    in the DETECT kernel's edge-padded layout straight from the conv
    chain (conv.octave_chain_pallas detect_pad mode) - no jnp.pad HBM
    round-trip between the two kernels. Returns (octaves, flags) where
    flags[o] says octave o is padded; the next octave's base then comes
    from an offset-decimating downsample of the padded plane.
    """
    from .params import gaussian_taps

    p = cfg.scale_params()
    batched = img.ndim == 3
    use_pallas = cfg.use_pallas and jax.default_backend() != "cpu"

    if use_pallas:
        from .ops.pallas.conv import (blur_pallas, downsample2_pallas,
                                      octave_chain_pallas)

        def blur(x, sigma):
            if sigma <= 0:
                return x
            return blur_pallas(x, gaussian_taps(sigma, p.filter_width_factor))

        def build(b, pp):
            # whole chain in one kernel launch: one base read + L level
            # writes instead of a pad+read+write HBM round-trip per level
            taps_list = [
                gaussian_taps(s, pp.filter_width_factor) if s > 0 else ()
                for s in pp.incremental_sigmas()
            ]
            h, w = b.shape[-2:]
            if detect_pad and min(h, w) >= 192:
                return octave_chain_pallas(b, taps_list, detect_pad=True)
            return octave_chain_pallas(b, taps_list), False
    else:
        def blur(x, sigma):
            return gaussian.blur(x, sigma, p.filter_width_factor)

        _build0 = (gaussian.build_octave_chain if cfg.conv_mode == "chain"
                   else gaussian.build_octave_direct)

        def build(b, pp):
            return _build0(b, pp), False

    octaves = []
    flags = []
    base = blur(img, p.initial_blur_sigma(cfg.first_octave))
    lds = p.level_ds - p.level_min
    for o in range(plan.num_octaves):
        if o > 0:
            src = octaves[-1][:, lds] if batched else octaves[-1][lds]
            if flags[-1]:
                # padded plane: the decimation's 0/1 selection matrices
                # absorb the (2, 2) origin - no relayout slice
                ph, pw = plan.octave_shapes[o - 1]
                base = downsample2_pallas(src, src_offset=(2, 2, ph, pw))
            else:
                base = resize.downsample(src, 1)
            # decimation keeps ceil(h/2) rows (even indices of h), but the
            # plan floor-halves like the reference (w>>1, h>>1,
            # PyramidCU.cpp:150): crop so plan and arrays agree for
            # odd-dimension octaves (no-op slice for even dims)
            oh, ow = plan.octave_shapes[o]
            base = base[..., :oh, :ow]
            skip = p.octave_restart_sigma()
            if skip > 0:
                base = blur(base, skip)
        oct_o, padded = build(base, p)
        octaves.append(oct_o)
        flags.append(padded)
    return (octaves, flags) if detect_pad else octaves


def _detect_norms(p, cfg: SiftConfig):
    """Per-level response norms: sigma^4 for the Hessian personality
    (the reference's octave term is deliberately disabled,
    PyramidCU.cpp:1569-1589); unused (1.0) for DoG."""
    if cfg.detector == "hessian":
        return [(p.level_sigma(l) ** 4)
                for l in range(p.level_min, p.level_max + 1)]
    return [1.0] * p.num_levels


def _detect_octave(gauss_oct: jnp.ndarray, plan: PipelinePlan,
                   cfg: SiftConfig):
    """Response + gradients + keypoint maps for one octave.

    Returns (maps, grad_k, rot_k): maps is a KeypointMaps with leaves
    stacked over key levels ((NK, H, W) - row i = key level
    p.key_levels[i]), grad_k/rot_k are the per-KEY-level gradient maps."""
    p = cfg.scale_params()
    if cfg.use_pallas and jax.default_backend() != "cpu":
        from .ops.pallas.detect import detect_octave_pallas
        return detect_octave_pallas(
            gauss_oct, _detect_norms(p, cfg), p.key_levels,
            threshold=p.threshold, edge_threshold=p.edge_threshold,
            subpixel=cfg.subpixel,
            darkness_adaption=cfg.darkness_adaption,
            detector=cfg.detector)
    if cfg.detector == "hessian":
        resp, grad, rot = hessian.hessian_response_and_gradient(
            gauss_oct, _detect_norms(p, cfg), grad_levels=p.key_levels)
    else:
        resp, grad, rot = hessian.dog_response_and_gradient(gauss_oct)

    maps = []
    for kl in p.key_levels:
        m = keypoint.detect_keypoints_level(
            resp[kl - 1], resp[kl], resp[kl + 1], gauss_oct[kl],
            threshold=p.threshold, edge_threshold=p.edge_threshold,
            subpixel=cfg.subpixel, hessian=(cfg.detector == "hessian"),
            darkness_adaption=cfg.darkness_adaption,
        )
        maps.append(m)
    if cfg.detector != "hessian":
        # DoG gradients come from gauss[1:], so grad[i] belongs to gauss
        # level i+1; re-align so grad[kl] is the keypoint level's gradient
        grad = jnp.concatenate([grad[:1], grad], axis=0)
        rot = jnp.concatenate([rot[:1], rot], axis=0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *maps)
    grad_k = jnp.stack([grad[kl] for kl in p.key_levels])
    rot_k = jnp.stack([rot[kl] for kl in p.key_levels])
    return stacked, grad_k, rot_k


class GlobalTable(NamedTuple):
    """Cross-level compacted keypoint table (level coordinates)."""
    x: jnp.ndarray
    y: jnp.ndarray
    sigma: jnp.ndarray
    theta: jnp.ndarray
    response: jnp.ndarray
    ftype: jnp.ndarray
    level_id: jnp.ndarray   # i32 flattened (octave * s + key_level - 1)
    valid: jnp.ndarray

    def count(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _globalize(lists: List[FeatureList], cap: int) -> GlobalTable:
    """Concatenate per-level (or per-octave blocked, with (NK, cap_o)
    leaves) lists and compact into one global table.

    Keeps level-major order (= the reference's output order). Level ids
    per slot are static, so the id vector is a compile-time constant."""
    def cat(field):
        return jnp.concatenate(
            [getattr(fl, field).reshape(-1) for fl in lists])

    lid_np = []
    base = 0
    for fl in lists:
        v = fl.valid
        if v.ndim == 2:       # blocked: rows are consecutive levels
            nk, c = v.shape
            lid_np.append(np.repeat(base + np.arange(nk), c))
            base += nk
        else:
            lid_np.append(np.full(v.shape[0], base))
            base += 1
    lid = jnp.asarray(np.concatenate(lid_np), jnp.int32)
    valid = cat("valid")
    # payloads ride one variadic sort (theta is still all-zero here, and
    # level_id packs with the 2-bit type) - gathers hit the scalar core
    lidft = (lid << 2) | (cat("ftype") & 3)
    cnt, outs, slot_valid = compact_sorted(
        valid,
        [cat("x"), cat("y"), cat("sigma"), cat("response"), lidft],
        cap,
    )
    x, y, s, r, lf = outs
    return GlobalTable(x=x, y=y, sigma=s, theta=jnp.zeros_like(x),
                       response=r, ftype=jnp.where(slot_valid, lf & 3, 0),
                       level_id=lf >> 2, valid=slot_valid)


def _flat_level_tables(plan: PipelinePlan, nkey: int):
    """Per-global-level (width, flat base offset) into the concatenated
    payload buffer (octave-major, level-major within octave)."""
    level_w, level_base = [], []
    base = 0
    for (h, w) in plan.octave_shapes:
        for r in range(nkey):
            level_w.append(w)
            level_base.append(base + r * h * w)
        base += nkey * h * w
    return level_w, level_base


def _globalize_packed(plists, flat_p1, flat_p2, level_w, level_base,
                      level_sigmas, sigma_step: float,
                      cap: int) -> GlobalTable:
    """_globalize twin for PackedLists with DEFERRED payload pickup.

    The per-octave lists carry one packed i32 per slot; the global sort
    moves only (key, packed) instead of six operands, and the payload
    planes are gathered ONCE at the global cap (cap slots) instead of at
    every per-octave capacity slot (sum(caps) ~ 3x more scalar-core
    gathers). Per-level constants resolve through 15-way select chains
    (vector ops), not gathers. Field values are bit-identical to
    _globalize on the eager lists (tests pin this).
    """
    valid = jnp.concatenate([fl.valid.reshape(-1) for fl in plists])
    packed = jnp.concatenate([fl.packed.reshape(-1) for fl in plists])
    cnt, outs, slot_valid = compact_sorted(valid, [packed], cap)
    pk = outs[0]
    lid = jax.lax.shift_right_logical(pk, 2) & 0x3F
    rowv = jax.lax.shift_right_logical(pk, 20)
    colv = jax.lax.shift_right_logical(pk, 8) & 0xFFF

    def lut(vals, dtype):
        out = jnp.full(pk.shape, vals[0], dtype)
        for l in range(1, len(vals)):
            out = jnp.where(lid == l, jnp.asarray(vals[l], dtype), out)
        return out

    wv = lut(level_w, jnp.int32)
    basev = lut(level_base, jnp.int32)
    sigv = lut(level_sigmas, jnp.float32)
    fsrc = basev + rowv * wv + colv
    dx, dy, resp, ds = _unpack_payload(flat_p1[fsrc], flat_p2[fsrc])
    x = colv.astype(jnp.float32) + 0.5 + dx
    y = rowv.astype(jnp.float32) + 0.5 + dy
    sig = sigv * jnp.power(sigma_step, ds)
    z = lambda a: jnp.where(slot_valid, a, jnp.zeros_like(a))
    return GlobalTable(
        x=z(x), y=z(y), sigma=z(sig), theta=jnp.zeros_like(x),
        response=z(resp), ftype=jnp.where(slot_valid, pk & 3, 0),
        level_id=jnp.where(slot_valid, lid, 0), valid=slot_valid)


def _recompact(table: GlobalTable, keep: jnp.ndarray, cap: int) -> GlobalTable:
    lidft = (table.level_id << 2) | (table.ftype & 3)
    cnt, outs, slot_valid = compact_sorted(
        keep & table.valid,
        [table.x, table.y, table.sigma, table.theta, table.response, lidft],
        cap,
    )
    x, y, s, t, r, lf = outs
    return GlobalTable(x=x, y=y, sigma=s, theta=t, response=r,
                       ftype=jnp.where(slot_valid, lf & 3, 0),
                       level_id=lf >> 2, valid=slot_valid)


def _topk_mask(table: GlobalTable, k: int) -> jnp.ndarray:
    """Selection mask for the k largest |response| (ties by global order).

    Behavior-equivalent to PyramidCU::SelectTopK (PyramidCU.cpp:1881-1989)."""
    absr = jnp.where(table.valid, jnp.abs(table.response), -jnp.inf)
    kk = min(k, absr.shape[0])
    vk = jax.lax.top_k(absr, kk)[0][-1]
    above = absr > vk
    n_above = jnp.sum(above.astype(jnp.int32))
    ties = absr == vk
    tie_rank = jnp.cumsum(ties.astype(jnp.int32))
    return above | (ties & (tie_rank <= (kk - n_above)))


def _level_trunc_mask(table: GlobalTable, k: int, num_levels: int,
                      keep_lowest: bool) -> jnp.ndarray:
    """-tc1/-tc2 level-dropping masks (SiftPyramid.cpp:224-277)."""
    ones = table.valid.astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, table.level_id, num_levels)
    if keep_lowest:
        cum = jnp.cumsum(counts)
        keep_level = (cum - counts) < k
    else:
        total = jnp.sum(counts)
        suffix = total - (jnp.cumsum(counts) - counts)
        keepable = suffix <= k
        first_keep = jnp.argmax(keepable)
        first_keep = jnp.where(jnp.any(keepable), first_keep, num_levels - 1)
        keep_level = jnp.arange(num_levels) >= first_keep
    return keep_level[table.level_id]


def _canvas_setup(oct_shapes, nkey: int, pad: int,
                  batch: Optional[int] = None, dtype=jnp.float32):
    """PackingPlan + canvas descriptors for the detect kernel's direct
    writes (shared by the single and batched pipelines).

    oct_shapes: per-octave (h, w) LOGICAL shapes (plan.octave_shapes -
    the stacks themselves may be in the detect-padded layout).

    Returns (pplan, gradc, rotc) where gradc/rotc are ShapeDtypeStructs:
    the FIRST kernel-path detect call creates the canvases as pure pallas
    outputs (skipping ~50 MB/image of zero-fill); later calls thread the
    real arrays through with input/output aliasing. Unwritten margin
    cells hold garbage by contract (see detect_octave_pallas docstring).
    """
    from .ops.pallas.patch import PackingPlan

    shapes = []
    for hw in oct_shapes:
        shapes += [tuple(hw)] * nkey
    pplan = PackingPlan(shapes, pad, dtype=dtype)
    n_planes = pplan.num_planes * (1 if batch is None else batch)
    gradc = jax.ShapeDtypeStruct((n_planes, pplan.Hp, pplan.Wp), dtype)
    return pplan, gradc, gradc


def _detect_octave_canvas(gauss_oct, o: int, nkey: int, p, cfg, pplan,
                          gradc, rotc, compressed: bool = False,
                          prepadded=None):
    """Kernel-path detection with grad/rot DMAed into the canvas cells."""
    from .ops.pallas.detect import detect_octave_pallas

    lids = [o * nkey + li for li in range(nkey)]
    return detect_octave_pallas(
        gauss_oct, _detect_norms(p, cfg), p.key_levels,
        threshold=p.threshold,
        edge_threshold=p.edge_threshold,
        subpixel=cfg.subpixel,
        darkness_adaption=cfg.darkness_adaption,
        detector=cfg.detector,
        compressed=compressed,
        prepadded=prepadded,
        canvas=(gradc, rotc,
                [pplan.plane_of[l] for l in lids],
                [pplan.dro[l] for l in lids],
                [pplan.dco[l] for l in lids],
                pplan.num_planes))


def _place_maps_in_canvas(pplan, o: int, nkey: int, grad, rot, gradc, rotc,
                          batch: Optional[int] = None):
    """Small (non-kernel) octaves: place jnp grad/rot maps into their
    canvas cells with dynamic_update_slice (vmapped when batched)."""
    if not isinstance(gradc, jnp.ndarray):
        # no kernel octave created the canvas yet (tiny input image):
        # materialize zeros to update into
        gradc = jnp.zeros(gradc.shape, gradc.dtype)
        rotc = jnp.zeros(rotc.shape, rotc.dtype)
    if batch is None:
        for li in range(nkey):
            l = o * nkey + li
            org = (pplan.plane_of[l], pplan.dro[l], pplan.dco[l])
            gradc = jax.lax.dynamic_update_slice(
                gradc, grad[li][None].astype(gradc.dtype), org)
            rotc = jax.lax.dynamic_update_slice(
                rotc, rot[li][None].astype(rotc.dtype), org)
        return gradc, rotc
    P = pplan.num_planes
    g4 = gradc.reshape(batch, P, pplan.Hp, pplan.Wp)
    r4 = rotc.reshape(batch, P, pplan.Hp, pplan.Wp)
    for li in range(nkey):
        l = o * nkey + li
        org = (pplan.plane_of[l], pplan.dro[l], pplan.dco[l])
        dus = lambda c, g: jax.lax.dynamic_update_slice(
            c, g[None].astype(c.dtype), org)
        g4 = jax.vmap(dus)(g4, grad[:, li])
        r4 = jax.vmap(dus)(r4, rot[:, li])
    return (g4.reshape(batch * P, pplan.Hp, pplan.Wp),
            r4.reshape(batch * P, pplan.Hp, pplan.Wp))


def run_pipeline(img: jnp.ndarray, plan: PipelinePlan, cfg: SiftConfig) -> FeatureTable:
    """Full detect+describe for one grayscale image (static shapes).

    img: (H, W) f32 in [0, 1].
    Returns a FeatureTable in image coordinates (reference download frame:
    x_img = 2^octave * (x_level - 0.5) + offset, orientation mirrored -
    PyramidCU.cpp:890-903).
    """
    p = cfg.scale_params()
    sigma_step = p.sigmak
    s = p.num_scales

    # named scopes carry the reference TIMINGS_* bucket names (config.h:
    # 17-31) into the compiled HLO's op metadata; utils.timing.
    # device_stage_breakdown maps profiler trace ops back through them.
    interpret0 = jax.default_backend() == "cpu"
    use_pallas0 = cfg.use_pallas and not interpret0
    with jax.named_scope("BUILD_PYRAMID"):
        if use_pallas0:
            octaves, pad_flags = _build_pyramid(img, plan, cfg,
                                                detect_pad=True)
        else:
            octaves = _build_pyramid(img, plan, cfg)
            pad_flags = [False] * len(octaves)

    NKEY = len(p.key_levels)
    max_sigma = p.key_level_sigma(p.key_levels[-1]) * \
        (sigma_step if cfg.subpixel else 1.0)
    owin = 2 * int(math.ceil(
        abs(max_sigma) * cfg.orientation_gaussian_factor
        * cfg.orientation_window_factor + 1.0)) + 1
    dwin = descriptor_window_size(max_sigma, cfg.descriptor_window_factor)
    pad = (max(owin, dwin) - 1) // 2 + 2

    # Pallas kernels on real accelerators; the jnp path on CPU (interpret
    # mode over thousands of grid programs is impractically slow - the
    # jnp/pallas equivalence is covered by tests/test_pallas_patch.py).
    interpret = jax.default_backend() == "cpu"
    use_pallas = cfg.use_pallas and not interpret
    # on device the detect kernel writes grad/rot blocks straight into
    # the PackedStack canvas (see run_pipeline_batched); both detector
    # personalities share the kernel (detector= selects the response)
    use_canvas = use_pallas
    cdt = jnp.bfloat16 if cfg.canvas_bf16 else jnp.float32
    if use_canvas:
        from .ops.pallas.patch import PackedStack
        pplan, gradc, rotc = _canvas_setup(plan.octave_shapes, NKEY, pad,
                                           dtype=cdt)

    # ---- detection + per-level compaction (cheap scatters) -------------------
    # packed lists + deferred payload pickup (see _globalize_packed)
    use_packed = use_canvas and all(
        h <= 4096 and w <= 4096 for (h, w) in plan.octave_shapes)
    all_lists: List[FeatureList] = []
    pay1: List[jnp.ndarray] = []
    pay2: List[jnp.ndarray] = []
    grads: List[jnp.ndarray] = []
    rots: List[jnp.ndarray] = []
    idx = 0
    for o, gauss_oct in enumerate(octaves):
        oh, ow = plan.octave_shapes[o]
        kernel_oct = use_canvas and min(oh, ow) >= 192
        # compressed kernel outputs: u16 sort key + packed payload planes
        # straight from the detect kernel (no XLA packing fusions, half
        # the stage-1 sort) - see detect_octave_pallas
        comp = kernel_oct and (ow << 2) < 0xFFFF
        sigmas = [p.key_level_sigma(kl) for kl in p.key_levels]
        with jax.named_scope("DETECT_KEYPOINTS"):
            if kernel_oct:
                maps, gradc, rotc = _detect_octave_canvas(
                    gauss_oct, o, NKEY, p, cfg, pplan, gradc, rotc,
                    compressed=comp,
                    prepadded=(oh, ow) if pad_flags[o] else None)
            else:
                maps, grad, rot = _detect_octave(gauss_oct, plan, cfg)
                if use_canvas:
                    gradc, rotc = _place_maps_in_canvas(
                        pplan, o, NKEY, grad, rot, gradc, rotc)
        with jax.named_scope("GENERATE_FEATURE_LIST"):
            # one blocked list per octave ((NK, cap) leaves)
            cap = plan.level_caps[idx]
            if use_packed:
                if comp:
                    key, p1, p2 = maps
                    all_lists.append(compact_octave_compressed_packed(
                        key, idx, cap))
                else:
                    plist, p1, p2 = compact_octave_maps_packed(maps, idx,
                                                               cap)
                    all_lists.append(plist)
                pay1.append(p1.reshape(-1))
                pay2.append(p2.reshape(-1))
            elif comp:
                all_lists.append(compact_octave_compressed(
                    *maps, sigmas, sigma_step, cap))
            else:
                all_lists.append(compact_octave_keypoints(
                    maps, sigmas, sigma_step, cap))
        if not use_canvas:
            for li in range(NKEY):
                grads.append(grad[li])
                rots.append(rot[li])
        idx += NKEY

    # ---- global table + flattened pyramid buffers -----------------------------
    # per-(octave, level) counts for the -v report (reference
    # PyramidCU.cpp:1327-1343) and the pre-reduction total (reference
    # "#Features Reduced" report, SiftPyramid.cpp:219-247)
    with jax.named_scope("GENERATE_FEATURE_LIST"):
        level_counts = jnp.concatenate(
            [fl.count() for fl in all_lists], axis=-1)
        G = min(cfg.global_feature_cap, sum(plan.level_caps))
        if use_packed:
            lw_t, lb_t = _flat_level_tables(plan, NKEY)
            sig_t = [p.key_level_sigma(kl) for kl in p.key_levels] \
                * plan.num_octaves
            table = _globalize_packed(
                all_lists, jnp.concatenate(pay1), jnp.concatenate(pay2),
                lw_t, lb_t, sig_t, sigma_step, G)
        else:
            table = _globalize(all_lists, G)
        pre_count = table.count()

    if not use_pallas:
        # flattened pyramid buffers for the jnp orientation/descriptor ops
        flat_grad = jnp.concatenate([g.reshape(-1) for g in grads])
        flat_rot = jnp.concatenate([r.reshape(-1) for r in rots])
        sizes = [g.shape for g in grads]
        bases = np.cumsum([0] + [h * w for (h, w) in sizes[:-1]])
        level_base = jnp.asarray(bases, jnp.int32)
        level_h = jnp.asarray([h for (h, _) in sizes], jnp.int32)
        level_w = jnp.asarray([w for (_, w) in sizes], jnp.int32)

    # ---- truncation (reference LimitFeatureCount, SiftPyramid.cpp:201-278)
    if cfg.feature_count_threshold > 0:
        k = cfg.feature_count_threshold
        with jax.named_scope("FEATURES_REDUCTION"):
            if cfg.truncate_method == TRUNCATE_TOP_K:
                table = _recompact(table, _topk_mask(table, k), G)
            elif cfg.truncate_method == TRUNCATE_KEEP_LOWEST_LEVELS:
                table = _recompact(
                    table, _level_trunc_mask(table, k, len(plan.level_caps),
                                             True),
                    G)
            elif cfg.truncate_method == TRUNCATE_KEEP_HIGHEST_LEVELS:
                table = _recompact(
                    table, _level_trunc_mask(table, k, len(plan.level_caps),
                                             False),
                    G)

    # ---- orientations (one pass over all levels) ------------------------------
    if use_pallas:
        from .ops.pallas.patch import (build_padded_stack, descriptor_pallas,
                                       orientation_pallas)
        with jax.named_scope("COMPUTE_ORIENTATIONS"):
            if use_canvas:
                pstack = PackedStack(gradc, rotc, *pplan.tables())
            else:
                pstack = build_padded_stack(grads, rots, pad, dtype=cdt)

    single = cfg.max_orientations <= 1 or cfg.fixed_orientation

    if cfg.fixed_orientation:
        table = table._replace(theta=jnp.zeros_like(table.theta))
        G_exp = G
    else:
        with jax.named_scope("COMPUTE_ORIENTATIONS"):
            if use_pallas:
                o_thetas, o_valid = orientation_pallas(
                    table.x, table.y, table.sigma, table.valid,
                    table.level_id, pstack,
                    wsize=owin, pad=pad,
                    gaussian_factor=cfg.orientation_gaussian_factor,
                    window_factor=cfg.orientation_window_factor,
                    peak_threshold=cfg.multi_orientation_threshold,
                    half_sift=cfg.half_sift, single=single,
                    max_peaks=cfg.max_orientations,
                    interpret=interpret)
            else:
                ores = compute_orientations_flat(
                    table.x, table.y, table.sigma, table.valid,
                    table.level_id, flat_grad, flat_rot,
                    level_base, level_h, level_w,
                    wsize=owin,
                    num_orientations=cfg.max_orientations,
                    gaussian_factor=cfg.orientation_gaussian_factor,
                    window_factor=cfg.orientation_window_factor,
                    peak_threshold=cfg.multi_orientation_threshold,
                    half_sift=cfg.half_sift,
                    single=single,
                )
                o_thetas, o_valid = ores.thetas, ores.valid
        if single:
            table = table._replace(theta=o_thetas[:, 0])
            G_exp = G
        else:
            with jax.named_scope("MULTI_ORIENTATIONS"):
                G_exp = int(G * cfg.expansion_factor + 7) // 8 * 8
                mask = (o_valid & table.valid[:, None]).reshape(-1)
                rep = lambda a: jnp.repeat(a, 4)
                lidft = (table.level_id << 2) | (table.ftype & 3)
                cnt, outs, slot_valid = compact_sorted(
                    mask,
                    [rep(table.x), rep(table.y), rep(table.sigma),
                     o_thetas.reshape(-1), rep(table.response),
                     rep(lidft)],
                    G_exp,
                )
                x, y, sg, th, r, lf = outs
                table = GlobalTable(
                    x=x, y=y, sigma=sg, theta=th, response=r,
                    ftype=jnp.where(slot_valid, lf & 3, 0),
                    level_id=lf >> 2, valid=slot_valid)

    # ---- descriptors (separate pass) ----------------------------------
    if cfg.compute_descriptors:
      with jax.named_scope("COMPUTE_DESCRIPTORS"):
        if use_pallas:
            from .ops.descriptor import finalize_descriptors
            desc = descriptor_pallas(
                table.x, table.y, table.sigma, table.theta, table.valid,
                table.level_id, pstack,
                wsize=dwin, pad=pad,
                window_factor=cfg.descriptor_window_factor,
                mxu=True, flat=False,
                interpret=interpret)
            desc = finalize_descriptors(desc, table.valid, cfg.half_sift,
                                        cfg.normalized_sift)
        else:
            desc = compute_descriptors_flat(
                table.x, table.y, table.sigma, table.theta, table.valid,
                table.level_id, flat_grad, flat_rot,
                level_base, level_h, level_w,
                wsize=dwin,
                window_factor=cfg.descriptor_window_factor,
                half_sift=cfg.half_sift,
                normalize=cfg.normalized_sift,
            )
    else:
        desc = jnp.zeros((table.x.shape[0], cfg.descriptor_dim),
                         jnp.float32)

    # ---- convert to image coordinates -----------------------------------------
    offset = 0.0 if cfg.lowe_origin else 0.5
    octave_id = table.level_id // s
    oss = jnp.exp2(octave_id.astype(jnp.float32) + cfg.first_octave)

    out = FeatureTable(
        x=oss * (table.x - 0.5) + offset,
        y=oss * (table.y - 0.5) + offset,
        sigma=oss * table.sigma,
        theta=jnp.where(table.valid,
                        jnp.mod(TWO_PI - table.theta, TWO_PI), 0.0),
        response=table.response,
        level=table.level_id,
        ftype=table.ftype,
        valid=table.valid,
        desc=desc,
    )
    aux = {"level_counts": level_counts, "pre_count": pre_count}
    return out, aux


def _detect_octave_batched(gauss_oct: jnp.ndarray, plan: PipelinePlan,
                           cfg: SiftConfig):
    """(B, L, H, W) batched octave detection.

    The Pallas detect kernel (both personalities) grids over
    (B, row-blocks) natively; the CPU path vmaps the XLA formulation."""
    p = cfg.scale_params()
    if cfg.use_pallas and jax.default_backend() != "cpu":
        from .ops.pallas.detect import detect_octave_pallas
        return detect_octave_pallas(
            gauss_oct, _detect_norms(p, cfg), p.key_levels,
            threshold=p.threshold, edge_threshold=p.edge_threshold,
            subpixel=cfg.subpixel,
            darkness_adaption=cfg.darkness_adaption,
            detector=cfg.detector)
    return jax.vmap(lambda g: _detect_octave(g, plan, cfg))(gauss_oct)


def run_pipeline_batched(imgs: jnp.ndarray, plan: PipelinePlan,
                         cfg: SiftConfig):
    """Full detect+describe for a batch (B, H, W) in ONE program flat in B.

    The TPU-native replacement for unrolling run_pipeline per image
    (compile time and program size then grow linearly in B): dense stages
    ride a (B, row-blocks) Pallas grid, per-keypoint stages see one
    concatenated (B * G) table over a (B * L)-plane padded stack (level_id
    offset by b * L), and the jnp compaction stages vmap. Numerics are
    identical to run_pipeline per image.

    Returns (FeatureTable with leading dim B, aux dict with
    level_counts (B, n_levels) and pre_count (B,)).
    """
    interpret = jax.default_backend() == "cpu"
    use_pallas = cfg.use_pallas and not interpret
    if not use_pallas:
        # CPU/jnp path: vmap traces the single-image pipeline once
        return jax.vmap(lambda im: run_pipeline(im, plan, cfg))(imgs)

    p = cfg.scale_params()
    sigma_step = p.sigmak
    s = p.num_scales
    B = imgs.shape[0]

    with jax.named_scope("BUILD_PYRAMID"):
        octaves, pad_flags = _build_pyramid(imgs, plan, cfg,
                                            detect_pad=True)

    NKEY = len(p.key_levels)
    max_sigma = p.key_level_sigma(p.key_levels[-1]) * \
        (sigma_step if cfg.subpixel else 1.0)
    owin = 2 * int(math.ceil(
        abs(max_sigma) * cfg.orientation_gaussian_factor
        * cfg.orientation_window_factor + 1.0)) + 1
    dwin = descriptor_window_size(max_sigma, cfg.descriptor_window_factor)
    pad = (max(owin, dwin) - 1) // 2 + 2

    from .ops.pallas.patch import (PackedStack, build_padded_stack,
                                   descriptor_pallas, orientation_pallas)
    # the detect kernel (both personalities) writes gradient/rotation
    # blocks STRAIGHT into the PackedStack canvas cells (no (NK, H, W)
    # intermediates, no pad/concat canvas build - that copy pass cost
    # ~2 ms/batch at B=16)
    use_canvas = True
    cdt = jnp.bfloat16 if cfg.canvas_bf16 else jnp.float32
    pplan, gradc, rotc = _canvas_setup(plan.octave_shapes, NKEY, pad,
                                       batch=B, dtype=cdt)

    # packed lists + deferred payload pickup (see _globalize_packed)
    use_packed = use_canvas and all(
        h <= 4096 and w <= 4096 for (h, w) in plan.octave_shapes)
    all_lists: List[FeatureList] = []
    pay1: List[jnp.ndarray] = []
    pay2: List[jnp.ndarray] = []
    grads: List[jnp.ndarray] = []
    rots: List[jnp.ndarray] = []
    idx = 0
    for o, gauss_oct in enumerate(octaves):
        oh, ow = plan.octave_shapes[o]
        kernel_oct = min(oh, ow) >= 192
        comp = use_canvas and kernel_oct and (ow << 2) < 0xFFFF
        sigmas = [p.key_level_sigma(kl) for kl in p.key_levels]
        cap = plan.level_caps[idx]
        with jax.named_scope("DETECT_KEYPOINTS"):
            if use_canvas and kernel_oct:
                maps, gradc, rotc = _detect_octave_canvas(
                    gauss_oct, o, NKEY, p, cfg, pplan, gradc, rotc,
                    compressed=comp,
                    prepadded=(oh, ow) if pad_flags[o] else None)
            else:
                maps, grad, rot = _detect_octave_batched(gauss_oct, plan,
                                                         cfg)
                if use_canvas:
                    gradc, rotc = _place_maps_in_canvas(
                        pplan, o, NKEY, grad, rot, gradc, rotc, batch=B)
        with jax.named_scope("GENERATE_FEATURE_LIST"):
            # one blocked list per octave ((B, NK, cap) leaves)
            if use_packed:
                if comp:
                    key, p1, p2 = maps
                    all_lists.append(jax.vmap(
                        lambda k3: compact_octave_compressed_packed(
                            k3, idx, cap))(key))
                else:
                    plist, p1, p2 = jax.vmap(
                        lambda ms: compact_octave_maps_packed(
                            ms, idx, cap))(maps)
                    all_lists.append(plist)
                pay1.append(p1.reshape(B, -1))
                pay2.append(p2.reshape(B, -1))
            elif comp:
                all_lists.append(jax.vmap(
                    lambda k3, q1, q2: compact_octave_compressed(
                        k3, q1, q2, sigmas, sigma_step, cap))(*maps))
            else:
                all_lists.append(jax.vmap(
                    lambda ms: compact_octave_keypoints(
                        ms, sigmas, sigma_step, cap))(maps))
        if not use_canvas:
            for li in range(NKEY):
                grads.append(grad[:, li])
                rots.append(rot[:, li])
        idx += NKEY

    with jax.named_scope("GENERATE_FEATURE_LIST"):
        level_counts = jnp.concatenate(
            [fl.count() for fl in all_lists], axis=-1)
        G = min(cfg.global_feature_cap, sum(plan.level_caps))
        if use_packed:
            lw_t, lb_t = _flat_level_tables(plan, NKEY)
            sig_t = [p.key_level_sigma(kl) for kl in p.key_levels] \
                * plan.num_octaves
            table = jax.vmap(
                lambda ls, f1, f2: _globalize_packed(
                    ls, f1, f2, lw_t, lb_t, sig_t, sigma_step, G))(
                tuple(all_lists), jnp.concatenate(pay1, axis=1),
                jnp.concatenate(pay2, axis=1))
        else:
            table = jax.vmap(lambda ls: _globalize(ls, G))(all_lists)
        pre_count = jnp.sum(table.valid.astype(jnp.int32), axis=-1)

    if cfg.feature_count_threshold > 0:
        k = cfg.feature_count_threshold
        nl = len(plan.level_caps)
        with jax.named_scope("FEATURES_REDUCTION"):
            if cfg.truncate_method == TRUNCATE_TOP_K:
                table = jax.vmap(
                    lambda t: _recompact(t, _topk_mask(t, k), G))(table)
            elif cfg.truncate_method == TRUNCATE_KEEP_LOWEST_LEVELS:
                table = jax.vmap(lambda t: _recompact(
                    t, _level_trunc_mask(t, k, nl, True), G))(table)
            elif cfg.truncate_method == TRUNCATE_KEEP_HIGHEST_LEVELS:
                table = jax.vmap(lambda t: _recompact(
                    t, _level_trunc_mask(t, k, nl, False), G))(table)

    L_tot = NKEY * len(octaves)
    with jax.named_scope("COMPUTE_ORIENTATIONS"):
        if use_canvas:
            pstack = PackedStack(gradc, rotc, *pplan.tables(B))
        else:
            pstack = build_padded_stack(grads, rots, pad, dtype=cdt)

    single = cfg.max_orientations <= 1 or cfg.fixed_orientation

    def flat(a):
        return a.reshape((-1,) + a.shape[2:])

    def offset_lid(t):
        return t.level_id + jnp.arange(B, dtype=jnp.int32)[:, None] * L_tot

    # The per-keypoint kernels prefetch their geometry tables into SMEM
    # (~1 MB/core); past ~32k table entries one launch overflows it, so
    # big batches split into chunked launches of the same compiled kernel.
    _MAX_TABLE = 32768

    def chunked(kernel_fn, tables, n_out):
        n = tables[0].shape[0]
        nch = -(-n // _MAX_TABLE)
        if nch <= 1:
            return kernel_fn(*tables)
        csz = -(-n // nch)
        outs = [kernel_fn(*(t[i * csz:(i + 1) * csz] for t in tables))
                for i in range(nch)]
        if n_out == 1:
            return jnp.concatenate(outs)
        return tuple(jnp.concatenate([o[j] for o in outs])
                     for j in range(n_out))

    if cfg.fixed_orientation:
        table = table._replace(theta=jnp.zeros_like(table.theta))
    else:
        with jax.named_scope("COMPUTE_ORIENTATIONS"):
            o_thetas, o_valid = chunked(
                lambda x, y, sg, vl, lid: orientation_pallas(
                    x, y, sg, vl, lid, pstack,
                    wsize=owin, pad=pad,
                    gaussian_factor=cfg.orientation_gaussian_factor,
                    window_factor=cfg.orientation_window_factor,
                    peak_threshold=cfg.multi_orientation_threshold,
                    half_sift=cfg.half_sift, single=single,
                    max_peaks=cfg.max_orientations,
                    interpret=interpret),
                (flat(table.x), flat(table.y), flat(table.sigma),
                 flat(table.valid), flat(offset_lid(table))), 2)
            o_thetas = o_thetas.reshape(B, G, 4)
            o_valid = o_valid.reshape(B, G, 4)
        if single:
            table = table._replace(theta=o_thetas[..., 0])
        else:
            with jax.named_scope("MULTI_ORIENTATIONS"):
                G_exp = int(G * cfg.expansion_factor + 7) // 8 * 8

                def expand(t, ot, ov):
                    mask = (ov & t.valid[:, None]).reshape(-1)
                    rep = lambda a: jnp.repeat(a, 4)
                    lidft = (t.level_id << 2) | (t.ftype & 3)
                    cnt, outs, slot_valid = compact_sorted(
                        mask,
                        [rep(t.x), rep(t.y), rep(t.sigma), ot.reshape(-1),
                         rep(t.response), rep(lidft)],
                        G_exp,
                    )
                    x, y, sg, th, r2, lf = outs
                    return GlobalTable(
                        x=x, y=y, sigma=sg, theta=th, response=r2,
                        ftype=jnp.where(slot_valid, lf & 3, 0),
                        level_id=lf >> 2, valid=slot_valid)

                table = jax.vmap(expand)(table, o_thetas, o_valid)

    if cfg.compute_descriptors:
        with jax.named_scope("COMPUTE_DESCRIPTORS"):
            from .ops.descriptor import finalize_descriptors
            fvalid = flat(table.valid)
            desc = chunked(
                lambda x, y, sg, th, vl, lid: descriptor_pallas(
                    x, y, sg, th, vl, lid, pstack,
                    wsize=dwin, pad=pad,
                    window_factor=cfg.descriptor_window_factor,
                    mxu=True, flat=False,
                    interpret=interpret),
                (flat(table.x), flat(table.y), flat(table.sigma),
                 flat(table.theta), fvalid, flat(offset_lid(table))), 1)
            desc = finalize_descriptors(desc, fvalid, cfg.half_sift,
                                        cfg.normalized_sift)
            desc = desc.reshape((B, -1) + desc.shape[1:])
    else:
        desc = jnp.zeros(table.x.shape + (cfg.descriptor_dim,), jnp.float32)

    offset = 0.0 if cfg.lowe_origin else 0.5
    octave_id = table.level_id // s
    oss = jnp.exp2(octave_id.astype(jnp.float32) + cfg.first_octave)

    out = FeatureTable(
        x=oss * (table.x - 0.5) + offset,
        y=oss * (table.y - 0.5) + offset,
        sigma=oss * table.sigma,
        theta=jnp.where(table.valid,
                        jnp.mod(TWO_PI - table.theta, TWO_PI), 0.0),
        response=table.response,
        level=table.level_id,
        ftype=table.ftype,
        valid=table.valid,
        desc=desc,
    )
    aux = {"level_counts": level_counts, "pre_count": pre_count}
    return out, aux


@functools.partial(jax.jit, static_argnums=(1, 2))
def run_pipeline_jit(img, plan: PipelinePlan, cfg_key):
    """Jitted wrapper keyed by the static plan + a hashable config.

    Returns (FeatureTable, aux) where aux carries the verbose-report
    scalars (per-level pre-reduction counts and the pre-reduction total).
    """
    return run_pipeline(img, plan, cfg_key.cfg)


class _CfgKey:
    """Hashable wrapper so SiftConfig (mutable dataclass) can be static."""

    def __init__(self, cfg: SiftConfig):
        self.cfg = cfg
        self._key = tuple(sorted(
            (k, v) for k, v in cfg.__dict__.items()
        ))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _CfgKey) and self._key == other._key


def prepare_input(img_np: np.ndarray, cfg: SiftConfig):
    """Normalize the input + compute the static plan: returns
    (arr (H, W) f32, plan, cfg_key) - the exact args of run_pipeline_jit."""
    from .ops.resize import rgb_to_gray, to_float

    arr = jnp.asarray(img_np)
    arr = to_float(arr)
    if arr.ndim == 3:
        arr = rgb_to_gray(arr)
    if cfg.detector == "hessian" and cfg.first_octave < 0:
        cfg = dataclasses.replace(cfg, first_octave=0)
    if cfg.first_octave > 0:
        # reference: SampleImageD of the input before octave 0
        arr = arr[:: 1 << cfg.first_octave, :: 1 << cfg.first_octave]
    elif cfg.first_octave < 0:
        # octave -1: bilinear upsample (reference SampleImageU,
        # ProgramCU.cu:233-310; SIFT personality only)
        from .ops.resize import upsample
        arr = upsample(arr, -cfg.first_octave)
    h, w = arr.shape
    plan = make_plan(h, w, cfg)
    return arr, plan, _CfgKey(cfg)


def detect_and_describe(img_np: np.ndarray, cfg: SiftConfig):
    """Host entry: NumPy image (H, W) or (H, W, C), any uint8/float dtype.

    Returns (FeatureTable, aux) - see run_pipeline_jit."""
    arr, plan, ckey = prepare_input(img_np, cfg)
    return run_pipeline_jit(arr, plan, ckey)
