"""End-to-end 3D SIFT extraction pipeline (TPU, single chip).

Equivalent of CSIFT3D::KpSiftAlgorithm (Src/cSIFT3D.cc:165-235):
normalise -> Gaussian scale space -> DoG -> detection -> orientation ->
descriptors, staged as a few jit modules per input shape (pyramid build,
one per big octave, one for the small-octave tail). All shapes are
static: the octave/level structure is unrolled at trace time from the
PyramidPlan, and keypoints live in fixed-capacity per-level arrays with
validity masks (TPUs have no dynamic shapes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import DESC_NUMEL, SiftConfig
from .pyramid import PyramidPlan, make_plan
from .ops import gaussian as G
from .ops import detect as D
from .ops import orientation as O
from .ops import descriptor as DE
from .ops.match import (
    ENHANCED,
    MatchResult,
    match_coords,
    match_descriptors,
)


class KeypointSet(NamedTuple):
    """Fixed-capacity keypoint collection for one volume.

    Mirrors the reference Keypoint struct (Include/cSIFT3D.h:52-70): level
    coordinates, octave/level/scale, original-image coordinates rx/ry/rz,
    the 3x3 eigenframe rotation, and the 768-D descriptor. `valid` marks
    lanes holding accepted keypoints (the reference's `filter` vector).
    """

    xyz: jnp.ndarray       # (K, 3) int32 — x, y, z level coords
    rxyz: jnp.ndarray      # (K, 3) f32 — original-image coords (x*2^octave)
    # rotation holds the DESCRIPTOR-frame matrix (R^T of the orientation
    # output [v1 v2 v1xv2]) — the form the reference's GetKeypoints()
    # observably returns after Extract_Descriptor_Imp's in-place transpose
    # (Src/cSIFT3D.cc:1214).
    octave: jnp.ndarray    # (K,) int32
    level: jnp.ndarray     # (K,) int32
    scale: jnp.ndarray     # (K,) f32
    rotation: jnp.ndarray  # (K, 3, 3) f32
    desc: jnp.ndarray      # (K, 768) f32
    status: jnp.ndarray    # (K,) int32 — 1 accepted, -1/-2/-3 rejected, 0 empty lane
    valid: jnp.ndarray     # (K,) bool — accepted keypoints
    counts: jnp.ndarray    # (L,) int32 — raw extrema count per detect level
    caps: jnp.ndarray      # (L,) int32 — static lane capacity per detect level

    @property
    def num_valid(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    @property
    def dropped_by_cap(self):
        """Extrema silently dropped because a level overflowed its static
        capacity (the reference grows its vectors unboundedly; the TPU
        pipeline keeps the first `cap` in scan order). Nonzero means recall
        loss — re-run with a larger ``max_kp_per_level``."""
        return jnp.sum(jnp.maximum(self.counts - self.caps, 0))


def build_pyramids(vol: jnp.ndarray, plan: PyramidPlan, constrain=None):
    """GSS + DoG pyramids (Build_Gaussian_Scale_Space /
    Build_DOG_Scale_Space, Src/cSIFT3D.cc:268-360).

    `constrain` is an optional per-level hook (array -> array) used by the
    multi-chip layer to attach sharding constraints to every level.
    """
    cfg = plan.cfg
    gl = cfg.gss_levels
    c = constrain or (lambda x: x)
    gss: list[jnp.ndarray] = []
    for o in range(plan.num_octaves):
        for i in range(gl):
            if o == 0 and i == 0:
                gss.append(c(G.gaussian_blur(vol, plan.base_sig)))
            elif i == 0:
                gss.append(c(G.downsample(gss[(o - 1) * gl + cfg.num_kp_levels])))
            else:
                gss.append(c(G.gaussian_blur(gss[o * gl + i - 1], plan.sigmas[i])))
    dog: list[jnp.ndarray] = []
    for o in range(plan.num_octaves):
        for i in range(1, gl):
            dog.append(c(G.dog(gss[o * gl + i - 1], gss[o * gl + i])))
    return gss, dog


def _extract_impl(vol: jnp.ndarray, plan: PyramidPlan, constrain=None) -> KeypointSet:
    cfg = plan.cfg
    dl = cfg.dog_levels

    vol = G.data_scale(vol.astype(jnp.float32))
    gss, dog = build_pyramids(vol, plan, constrain)

    sets = []
    for o in range(plan.num_octaves):
        for i in range(1, dl - 1):
            sets.append(
                _level_stage(
                    dog[o * dl + i - 1], dog[o * dl + i], dog[o * dl + i + 1],
                    gss[o * cfg.gss_levels + i],
                    plan=plan, o=o, i=i,
                )
            )
    return sort_valid_first(merge_sets(sets))


def _level_stage(dog_prev, dog_cur, dog_next, gss_level, *, plan, o, i):
    """Detection + orientation + descriptors for one (octave, level).

    Traced into per-octave(-group) jit modules by _octave_stage: one
    end-to-end program would blow up XLA compile time (superlinear in
    module size), per-level modules would pay a dispatch round trip each.
    """
    det = _detect_stage(dog_prev, dog_cur, dog_next, plan=plan, o=o)
    return _describe_stage(det, gss_level, plan=plan, o=o, i=i)


def _detect_stage(dog_prev, dog_cur, dog_next, *, plan, o):
    """Detection half of _level_stage (split out so the rolled-octave
    streaming path can free dog_prev before the window-gather-heavy
    orientation/descriptor half runs — at 768^3 the fused stage's ~6 live
    1.7 GB levels plus pad copy and window buffers exceed 16 GB HBM)."""
    cfg = plan.cfg
    return D.detect_level(dog_prev, dog_cur, dog_next, cfg.peak_thresh,
                          cfg.cap_for_octave(o), use_pallas=cfg.use_pallas)


def _describe_stage(det, gss_level, *, plan, o, i):
    """Orientation + descriptor half of _level_stage (same ops in the same
    order as the fused stage — only the module boundary moves, so results
    are bit-identical; tests/test_pipeline.py streaming-equality)."""
    gss_pad = jnp.pad(gss_level, 1)
    return _orient_describe(det, gss_pad, plan=plan, o=o, i=i)


def _orient_describe(det, gss_pad, *, plan, o, i, z_off=0, y_off=0):
    """Orientation + descriptors for one level's detections.

    Shared tail of the single-chip `_level_stage` and the multi-chip
    shard_map stage (parallel/sharded_pallas.py), where `gss_pad` is a
    halo-extended local block and `z_off`/`y_off` map global padded
    rows/columns to local slab indices.
    """
    cfg = plan.cfg
    cap = det.x.shape[0]
    meta = plan.gss_meta(o, i)

    ori = O.assign_orientation(gss_pad, det, meta, cfg, z_off=z_off,
                               y_off=y_off)
    accepted = det.valid & (ori.status == 1)

    order = jnp.argsort(~accepted, stable=True)
    det = D.LevelDetections(
        x=det.x[order], y=det.y[order], z=det.z[order],
        valid=det.valid[order], count=det.count, threshold=det.threshold,
    )
    ori = O.OrientationResult(
        status=ori.status[order], rotation=ori.rotation[order],
        str_tensor=ori.str_tensor[order], mean_grad=ori.mean_grad[order],
    )
    accepted = accepted[order]

    desc = DE.extract_descriptors(gss_pad, det, ori.rotation, accepted, meta,
                                  cfg, z_off=z_off, y_off=y_off)

    coord_factor = jnp.float32(2.0 ** o)
    xyz = jnp.stack([det.x, det.y, det.z], axis=-1)
    return KeypointSet(
        xyz=xyz,
        rxyz=xyz.astype(jnp.float32) * coord_factor,
        octave=jnp.full((cap,), o, jnp.int32),
        level=jnp.full((cap,), i, jnp.int32),
        scale=jnp.full((cap,), meta.scale, jnp.float32),
        # The reference's observable Keypoint.Rotation is the DESCRIPTOR-
        # frame matrix: Extract_Descriptor_Imp transposes the orientation
        # matrix in place before use (Src/cSIFT3D.cc:1214) and never
        # restores it, so GetKeypoints() returns R^T of the orientation
        # output. Store the same form (verified against the reference
        # binary by tools/reference_parity.py).
        rotation=jnp.swapaxes(ori.rotation, 1, 2),
        desc=desc.desc,
        status=ori.status,
        valid=accepted,
        counts=det.count[None],
        caps=jnp.full((1,), cap, jnp.int32),
    )


def merge_sets(sets: list[KeypointSet]) -> KeypointSet:
    return KeypointSet(
        *[jnp.concatenate([getattr(s, f) for s in sets])
          for f in KeypointSet._fields]
    )


def sort_valid_first(kps: KeypointSet) -> KeypointSet:
    """Stable-sort lanes so valid keypoints form a dense prefix.

    Relative order of valid keypoints — (octave, level) then scan order —
    is preserved, matching the reference's `filter` vector ordering
    (Src/cSIFT3D.cc:459-466). Runs on device: downstream compaction then
    only needs the count, not a host-side nonzero.
    """
    order = jnp.argsort(~kps.valid, stable=True)
    return KeypointSet(
        *[getattr(kps, f) if f in ("counts", "caps") else getattr(kps, f)[order]
          for f in KeypointSet._fields]
    )


def _octave_stage(dogs, gsss, *, plan, o):
    """All detect levels of one octave in a single jit module.

    dogs: the octave's dog_levels DoG arrays; gsss: the keypoint-level GSS
    arrays (index i-1 holds level i). One module per octave amortises
    per-dispatch overhead over the levels without the mega-jit compile blowup
    (XLA compile time is superlinear in module size).
    """
    cfg = plan.cfg
    sets = [
        _level_stage(dogs[i - 1], dogs[i], dogs[i + 1], gsss[i - 1],
                     plan=plan, o=o, i=i)
        for i in range(1, cfg.dog_levels - 1)
    ]
    return merge_sets(sets)


def _octave_group_stage(dogs_per_o, gsss_per_o, *, plan, octaves):
    """Several octaves' level stages fused into one jit module.

    Used for the small octaves (o >= 1): their per-level compute is tiny, so
    one dispatch per octave is dominated by host/tunnel dispatch latency;
    fusing them into a single module costs little compile time (module size
    tracks voxel count) and removes ~5 dispatches per volume.
    """
    return merge_sets([
        _octave_stage(dogs_per_o[k], gsss_per_o[k], plan=plan, o=o)
        for k, o in enumerate(octaves)
    ])


# Octaves with at least this many voxels per level get their own jit
# module; smaller ones are fused into one tail module (dispatch latency
# dominates their compute). 8M: 256^3 octave 0 is alone, 128^3 and below
# are fused.
_GROUP_VOXELS = 8 * 1024 * 1024

# extract_pair fuses both volumes into each module (halving dispatches);
# above this per-volume voxel count two FULL pyramid sets (~6 GB each at
# 512^3) cannot be live together, so the pair switches to the STREAMING
# octave path: one module per octave group builds that octave's GSS/DoG
# for both volumes from the previous octave's seed level, runs the level
# stages, and returns only the keypoint sets plus the next seed — each
# octave's pyramid buffers die with their module (peak ~9 GB at 512^3
# instead of ~13.5). Below the threshold the fused path stays the default:
# streaming measured 0.613 s vs 0.591 at 256^3 (r4 A/B — the fused pair's
# larger modules hide more dispatch latency when memory permits).
_PAIR_VOXELS = 32 * 1024 * 1024


def _octave_levels(seed, plan, o):
    """One octave's GSS + DoG arrays from its seed (the raw volume at o=0,
    the previous octave's gss[num_kp_levels] otherwise). Same math and op
    order as build_pyramids (Build_Gaussian_Scale_Space,
    Src/cSIFT3D.cc:268-360), restaged for streaming."""
    cfg = plan.cfg
    gl = cfg.gss_levels
    gss = []
    for i in range(gl):
        if i == 0:
            if o == 0:
                gss.append(G.gaussian_blur(G.data_scale(seed), plan.base_sig))
            else:
                gss.append(G.downsample(seed))
        else:
            gss.append(G.gaussian_blur(gss[i - 1], plan.sigmas[i]))
    dog = [G.dog(gss[i - 1], gss[i]) for i in range(1, gl)]
    return gss, dog


# Single-volume extract() switches to the streaming octave path above this
# voxel count: the fused path keeps both full pyramids (~11 levels) live,
# ~8.2 GB at 544^3 and ~22 GB at 768^3 — past 16 GB HBM. 512^3 (134M) stays
# fused (measured faster when memory permits, r4 pair A/B). The reference
# has no such cliff only because it allocates in host RAM
# (Src/cUtil.cc:177-235); streaming matches its unbounded-size capability.
_SINGLE_VOXELS = 160 * 1024 * 1024

# Octaves whose levels exceed this stream LEVEL-BY-LEVEL (each blur/DoG/
# stage its own module, consumed buffers freed as the python refs drop):
# a whole-octave streaming module still keeps ~8 levels live at its level
# stages (~14.5 GB at 768^3, OOM-adjacent); the rolled chain holds at most
# 6 levels + one blur temp (~12.6 GB at 768^3).
_ROLL_VOXELS = 160 * 1024 * 1024


def _stream_group_fn1(plan, group):
    """Single-volume analogue of _stream_group_fn:
    seed -> (sets, next_seed)."""
    cfg = plan.cfg
    dl = cfg.dog_levels

    def fn(seed):
        sets_v = []
        for o in group:
            gss, dog = _octave_levels(seed, plan, o)
            sets_v.append(_octave_stage(
                tuple(dog), tuple(gss[1: dl - 1]), plan=plan, o=o))
            seed = gss[cfg.num_kp_levels]
        return merge_sets(sets_v), seed

    return fn


def _stream_group_fn(plan, group):
    """Module body for one octave group of the streaming pair path:
    (seed_a, seed_b) -> (sets_a, sets_b, next_seed_a, next_seed_b)."""
    cfg = plan.cfg
    dl = cfg.dog_levels

    def fn(seed_a, seed_b):
        outs, seeds = [], []
        for seed in (seed_a, seed_b):
            sets_v = []
            for o in group:
                gss, dog = _octave_levels(seed, plan, o)
                sets_v.append(_octave_stage(
                    tuple(dog), tuple(gss[1: dl - 1]), plan=plan, o=o))
                seed = gss[cfg.num_kp_levels]
            outs.append(merge_sets(sets_v))
            seeds.append(seed)
        return outs[0], outs[1], seeds[0], seeds[1]

    return fn


class SIFT3D:
    """User-facing pipeline object (the reference's CSIFT3D + factory,
    Include/cSIFT3D.h:118-204). One instance per configuration.

    Extraction is staged: one jit for the pyramid build, one jit per big
    octave plus one fused module for the small-octave tail. Each stage
    caches its compiled program per input shape.
    """

    def __init__(self, cfg: SiftConfig | None = None):
        self.cfg = cfg or SiftConfig()
        self._pyramid_jit = {}
        self._octave_jits = {}
        self._finalize_jit = jax.jit(
            lambda sets: sort_valid_first(merge_sets(sets))
        )

    def plan(self, shape: tuple[int, int, int]) -> PyramidPlan:
        return make_plan(self.cfg, shape)

    def warmup(self, shape: tuple[int, int, int], max_workers: int = 4,
               pair: bool = False):
        """Compile every module for `shape` concurrently (cold-start path).

        XLA compiles the six octave modules + pyramid module independently;
        lowering them under a thread pool overlaps the C++ compile work
        (the GIL is released inside XLA) and populates the persistent
        compile cache, so the subsequent on-line jit calls deserialize
        instead of recompiling. Returns seconds spent.
        """
        import time
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.time()
        plan = self.plan(shape)
        cfg = self.cfg
        dl, gl = cfg.dog_levels, cfg.gss_levels

        vol_s = jax.ShapeDtypeStruct(shape, jnp.float32)
        if shape not in self._pyramid_jit:
            def pyramids(v):
                v = G.data_scale(v)
                return build_pyramids(v, plan)

            self._pyramid_jit[shape] = jax.jit(pyramids)
        gss_s, dog_s = jax.eval_shape(self._pyramid_jit[shape], vol_s)

        def args_for(o):
            return (
                tuple(dog_s[o * dl: (o + 1) * dl]),
                tuple(gss_s[o * gl + 1: o * gl + dl - 1]),
            )

        jobs = [(self._pyramid_jit[shape], (vol_s,))]
        for group in self._octave_groups(plan):
            key = (shape, group)
            if key not in self._octave_jits:
                if len(group) == 1:
                    fn = functools.partial(_octave_stage, plan=plan, o=group[0])
                    self._octave_jits[key] = jax.jit(
                        lambda dg, gs, _fn=fn: _fn(dg[0], gs[0])
                    )
                else:
                    self._octave_jits[key] = jax.jit(functools.partial(
                        _octave_group_stage, plan=plan, octaves=group
                    ))
            jobs.append((
                self._octave_jits[key],
                (tuple(args_for(o)[0] for o in group),
                 tuple(args_for(o)[1] for o in group)),
            ))

        if pair and int(np.prod(shape)) > _PAIR_VOXELS:
            # streaming pair path: one module per octave group, seeded by
            # the previous group's gss[num_kp_levels]
            jobs = []
            groups = self._octave_groups(plan)
            seed_shape = shape
            for k, group in enumerate(groups):
                key = ("pstream", shape, group)
                if key not in self._octave_jits:
                    donate = (0, 1) if k > 0 else ()
                    self._octave_jits[key] = jax.jit(
                        _stream_group_fn(plan, group), donate_argnums=donate
                    )
                seed_s = jax.ShapeDtypeStruct(seed_shape, jnp.float32)
                jobs.append((self._octave_jits[key], (seed_s, seed_s)))
                seed_shape = plan.gss_meta(group[-1], cfg.num_kp_levels).shape

        elif pair:
            # the pair modules contain two copies of the same graph; XLA
            # compiles them afresh, so warm them instead of the singles
            key = ("pair", shape)
            if key not in self._pyramid_jit:
                def pyramids2(a, b):
                    a = G.data_scale(a)
                    b = G.data_scale(b)
                    return build_pyramids(a, plan), build_pyramids(b, plan)

                self._pyramid_jit[key] = jax.jit(pyramids2)
            jobs = [(self._pyramid_jit[key], (vol_s, vol_s))]
            for group in self._octave_groups(plan):
                gkey = ("pair", shape, group)
                if gkey not in self._octave_jits:
                    if len(group) == 1:
                        fn = functools.partial(_octave_stage, plan=plan,
                                               o=group[0])
                        self._octave_jits[gkey] = jax.jit(
                            lambda da, ga, db, gb, _fn=fn:
                            (_fn(da[0], ga[0]), _fn(db[0], gb[0]))
                        )
                    else:
                        fn = functools.partial(_octave_group_stage, plan=plan,
                                               octaves=group)
                        self._octave_jits[gkey] = jax.jit(
                            lambda da, ga, db, gb, _fn=fn:
                            (_fn(da, ga), _fn(db, gb))
                        )
                dg = tuple(args_for(o)[0] for o in group)
                gs = tuple(args_for(o)[1] for o in group)
                jobs.append((self._octave_jits[gkey], (dg, gs, dg, gs)))

        def compile_one(job):
            fn, args = job
            fn.lower(*args).compile()

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(compile_one, jobs))
        return time.time() - t0

    def extract_timed(self, volume):
        """extract() with per-stage wall-clock timing (the reference's
        time_info/SIFT_TimerPara reports, Src/cSIFT3D.cc:78-101, 228-233).
        Returns (KeypointSet, SiftTimer)."""
        import jax as _jax

        from .utils.timing import SiftTimer

        timer = SiftTimer()
        vol = jnp.asarray(volume, dtype=jnp.float32)
        shape = tuple(int(s) for s in vol.shape)
        plan = self.plan(shape)
        with timer.stage("BuildGSS+DoG"):
            gss, dog = self._pyramids(vol, shape, plan)
            _jax.block_until_ready((gss, dog))
        with timer.stage("Detect+Orient+Describe (per octave)"):
            sets = self._octaves(gss, dog, shape, plan)
            _jax.block_until_ready(sets)
        with timer.stage("Merge"):
            merged = self._finalize_jit(sets)
            _jax.block_until_ready(merged)
        return merged, timer

    def _pyramids(self, vol, shape, plan):
        if shape not in self._pyramid_jit:
            def pyramids(v):
                v = G.data_scale(v)
                return build_pyramids(v, plan)

            self._pyramid_jit[shape] = jax.jit(pyramids)
        return self._pyramid_jit[shape](vol)

    def _octave_groups(self, plan) -> list[tuple[int, ...]]:
        """Dispatch groups: big octaves alone, all small ones fused.

        An octave is "big" while its level compute is large enough to hide
        dispatch latency; below _GROUP_VOXELS the whole tail goes into one
        module (one dispatch instead of one per octave)."""
        big = [
            o for o in range(plan.num_octaves)
            if np.prod(plan.gss_meta(o, 1).shape) >= _GROUP_VOXELS
        ]
        tail = [o for o in range(plan.num_octaves) if o not in big]
        groups = [(o,) for o in big]
        if tail:
            groups.append(tuple(tail))
        return groups

    def _octaves(self, gss, dog, shape, plan):
        cfg = self.cfg
        dl, gl = cfg.dog_levels, cfg.gss_levels

        def args_for(o):
            return (
                tuple(dog[o * dl: (o + 1) * dl]),
                tuple(gss[o * gl + 1: o * gl + dl - 1]),
            )

        sets = []
        for group in self._octave_groups(plan):
            key = (shape, group)
            if key not in self._octave_jits:
                if len(group) == 1:
                    fn = functools.partial(_octave_stage, plan=plan, o=group[0])
                    self._octave_jits[key] = jax.jit(
                        lambda dg, gs, _fn=fn: _fn(dg[0], gs[0])
                    )
                else:
                    self._octave_jits[key] = jax.jit(functools.partial(
                        _octave_group_stage, plan=plan, octaves=group
                    ))
            dgs = tuple(args_for(o)[0] for o in group)
            gss_g = tuple(args_for(o)[1] for o in group)
            sets.append(self._octave_jits[key](dgs, gss_g))
        return sets

    def extract(self, volume) -> KeypointSet:
        """volume: (nz, ny, nx) array-like, any dtype castable to float32.

        The returned KeypointSet is lane-sorted so valid keypoints form a
        dense prefix (reference `filter` order). Volumes above
        _SINGLE_VOXELS stream (identical math, bounded HBM — matching the
        reference's host-RAM-bounded sizes, Src/cUtil.cc:177-235)."""
        vol = jnp.asarray(volume, dtype=jnp.float32)
        shape = tuple(int(s) for s in vol.shape)
        plan = self.plan(shape)
        if int(np.prod(shape)) > _SINGLE_VOXELS:
            return self._extract_streaming(vol, shape, plan)
        gss, dog = self._pyramids(vol, shape, plan)
        sets = self._octaves(gss, dog, shape, plan)
        return self._finalize_jit(sets)

    def _extract_streaming(self, vol, shape, plan=None) -> KeypointSet:
        """Streaming single-volume extraction: octave groups run as seeded
        modules whose pyramid buffers die with them (_stream_group_fn1);
        octaves above _ROLL_VOXELS roll level by level. Bit-identical to
        extract() — same ops in the same order, only the module boundaries
        move (tests/test_pipeline.py streaming-equality)."""
        plan = plan or self.plan(shape)
        sets = []
        seed = vol
        owned = False  # the caller's volume must not be donated/freed
        for group in self._octave_groups(plan):
            big = (len(group) == 1 and int(
                np.prod(plan.gss_meta(group[0], 1).shape)) > _ROLL_VOXELS)
            if big:
                seed, s = self._rolled_octave(seed, shape, plan, group[0],
                                              owned)
                sets.extend(s)
            else:
                key = ("stream1", shape, group, owned)
                if key not in self._octave_jits:
                    donate = (0,) if owned else ()
                    self._octave_jits[key] = jax.jit(
                        _stream_group_fn1(plan, group), donate_argnums=donate)
                s, seed = self._octave_jits[key](seed)
                sets.append(s)
            owned = True
        return self._finalize_jit(sets)

    def _rolled_octave(self, seed, shape, plan, o, seed_owned):
        """Level-rolled streaming for one huge octave: every blur+DoG step,
        detection, and orientation+descriptor stage is its own jit module,
        and consumed levels are freed as the python references drop. The
        worst module (describe j=1) holds 5 live levels plus the pad copy
        (~10.5 GB at 768^3) — the fused level stage held 6 plus detect
        temporaries and OOM'd 16 GB HBM (EXTRACT_LARGE_r05.json carries
        the measured run + analytic accounting). Returns
        (next_seed, sets)."""
        cfg = self.cfg
        gl, dl = cfg.gss_levels, cfg.dog_levels

        def jit_for(name, fn, donate=()):
            key = ("roll", shape, o, name)
            if key not in self._octave_jits:
                self._octave_jits[key] = jax.jit(fn, donate_argnums=donate)
            return self._octave_jits[key]

        if o == 0:
            base = jit_for("base", lambda v: G.gaussian_blur(
                G.data_scale(v), plan.base_sig))
        else:
            base = jit_for(
                "down", lambda s: G.downsample(s),
                donate=(0,) if seed_owned else ())
        gss = {0: base(seed)}
        del seed
        dogs: dict[int, jnp.ndarray] = {}
        sets = []
        next_seed = None
        for i in range(1, gl):
            if i < gl - 1:
                def step_fn(prev, _sig=plan.sigmas[i]):
                    nxt = G.gaussian_blur(prev, _sig)
                    return nxt, G.dog(prev, nxt)

                gss[i], dogs[i - 1] = jit_for(f"step{i}", step_fn)(gss[i - 1])
            else:
                # last level's GSS feeds only its DoG — keep it internal
                def last_fn(prev, _sig=plan.sigmas[i]):
                    return G.dog(prev, G.gaussian_blur(prev, _sig))

                dogs[i - 1] = jit_for(f"step{i}", last_fn)(gss[i - 1])
            if i == cfg.num_kp_levels:
                next_seed = gss[i]
            # gss[i-1] was needed for this step's blur+DoG; it stays live
            # only while a later level stage gathers windows from it
            # (levels 1..dl-2) or it seeds the next octave.
            if not (1 <= i - 1 <= dl - 2) and i - 1 != cfg.num_kp_levels:
                gss.pop(i - 1, None)
            j = i - 2  # stage j needs dogs j-1..j+1 (detect_level 3-high)
            if 1 <= j <= dl - 2:
                # Split stage: detect (3 DoG levels) then orient+describe
                # (GSS only), with dogs[j-1] freed in between — the fused
                # stage would hold 6 live levels PLUS the pad copy and
                # window buffers at once, which OOMs 16 GB HBM at 768^3.
                # Same ops in the same order, so bit-identical to the
                # fused _level_stage (streaming-equality test).
                det_jit = jit_for(f"detect{j}", functools.partial(
                    _detect_stage, plan=plan, o=o))
                det = det_jit(dogs[j - 1], dogs[j], dogs[j + 1])
                del dogs[j - 1]
                st = jit_for(f"describe{j}", functools.partial(
                    _describe_stage, plan=plan, o=o, i=j))
                out = st(det, gss[j])
                # At huge levels the per-stage KeypointSet buffers (~0.2-
                # 0.4 GB each at full-recall caps) would otherwise pile up
                # on HBM next to ~6 live pyramid levels; park them on host
                # until the pyramids are gone (the merge re-uploads them).
                if int(np.prod(plan.gss_meta(o, j).shape)) > _ROLL_VOXELS:
                    out = KeypointSet(*jax.device_get(tuple(out)))
                sets.append(out)
                if j != cfg.num_kp_levels:
                    gss.pop(j, None)
        return next_seed, sets

    def extract_pair(self, ref, tar) -> tuple[KeypointSet, KeypointSet]:
        """extract() for two same-shape volumes with both volumes fused
        into each stage module: half the dispatches of two extract() calls
        (dispatch latency is a full host<->device round trip on remote
        tunnels). Falls back to sequential extraction when shapes differ or
        the volume is too large to double-buffer (> _PAIR_VOXELS).
        """
        ref = jnp.asarray(ref, dtype=jnp.float32)
        tar = jnp.asarray(tar, dtype=jnp.float32)
        shape = tuple(int(s) for s in ref.shape)
        if tuple(int(s) for s in tar.shape) != shape:
            return self.extract(ref), self.extract(tar)
        if int(np.prod(shape)) > _PAIR_VOXELS:
            return self._extract_pair_streaming(ref, tar, shape)
        plan = self.plan(shape)

        key = ("pair", shape)
        if key not in self._pyramid_jit:
            def pyramids2(a, b):
                a = G.data_scale(a)
                b = G.data_scale(b)
                return build_pyramids(a, plan), build_pyramids(b, plan)

            self._pyramid_jit[key] = jax.jit(pyramids2)
        (gss_a, dog_a), (gss_b, dog_b) = self._pyramid_jit[key](ref, tar)

        cfg = self.cfg
        dl, gl = cfg.dog_levels, cfg.gss_levels

        def args_for(dog, gss, o):
            return (
                tuple(dog[o * dl: (o + 1) * dl]),
                tuple(gss[o * gl + 1: o * gl + dl - 1]),
            )

        sets_a, sets_b = [], []
        for group in self._octave_groups(plan):
            key = ("pair", shape, group)
            if key not in self._octave_jits:
                if len(group) == 1:
                    fn = functools.partial(_octave_stage, plan=plan,
                                           o=group[0])
                    self._octave_jits[key] = jax.jit(
                        lambda da, ga, db, gb, _fn=fn:
                        (_fn(da[0], ga[0]), _fn(db[0], gb[0]))
                    )
                else:
                    fn = functools.partial(_octave_group_stage, plan=plan,
                                           octaves=group)
                    self._octave_jits[key] = jax.jit(
                        lambda da, ga, db, gb, _fn=fn:
                        (_fn(da, ga), _fn(db, gb))
                    )
            da = tuple(args_for(dog_a, gss_a, o)[0] for o in group)
            ga = tuple(args_for(dog_a, gss_a, o)[1] for o in group)
            db = tuple(args_for(dog_b, gss_b, o)[0] for o in group)
            gb = tuple(args_for(dog_b, gss_b, o)[1] for o in group)
            sa, sb = self._octave_jits[key](da, ga, db, gb)
            sets_a.append(sa)
            sets_b.append(sb)

        if "pair_fin" not in self._octave_jits:
            self._octave_jits["pair_fin"] = jax.jit(
                lambda a, b: (sort_valid_first(merge_sets(a)),
                              sort_valid_first(merge_sets(b)))
            )
        return self._octave_jits["pair_fin"](sets_a, sets_b)

    def _extract_pair_streaming(self, ref, tar, shape):
        """Pair extraction for volumes too large to double-buffer full
        pyramids: per octave group, ONE module builds the group's GSS/DoG
        for both volumes from the previous group's seed level, runs the
        level stages, and emits only keypoint sets + the next seed. Pyramid
        buffers never outlive their module (512^3 peak ~9 GB vs ~13.5 for
        the fused-pyramid path), and dispatch count matches the fused pair
        path instead of doubling with sequential extracts."""
        plan = self.plan(shape)
        sets_a, sets_b = [], []
        seed_a, seed_b = ref, tar
        for k, group in enumerate(self._octave_groups(plan)):
            key = ("pstream", shape, group)
            if key not in self._octave_jits:
                # seeds of later groups are module outputs this method owns
                # — donate them; the first group's seeds are caller arrays.
                donate = (0, 1) if k > 0 else ()
                self._octave_jits[key] = jax.jit(
                    _stream_group_fn(plan, group), donate_argnums=donate
                )
            sa, sb, seed_a, seed_b = self._octave_jits[key](seed_a, seed_b)
            sets_a.append(sa)
            sets_b.append(sb)

        if "pair_fin" not in self._octave_jits:
            self._octave_jits["pair_fin"] = jax.jit(
                lambda a, b: (sort_valid_first(merge_sets(a)),
                              sort_valid_first(merge_sets(b)))
            )
        return self._octave_jits["pair_fin"](sets_a, sets_b)

    def process_pair(
        self, ref_volume, tar_volume, threshold: float = 0.85,
        mode: int = ENHANCED,
    ):
        """Full extract+extract+match with the reference's SIFT_PROCESS
        timing bundle (Include/Util/common.h:43-59): per-stage extraction
        timers for both volumes plus the matcher phase breakdown.

        Returns ((ref_coords, tar_coords, valid), SiftProcessReport)."""
        from .utils.timing import SiftProcessReport

        report = SiftProcessReport()
        ref_kps, report.ref = self.extract_timed(ref_volume)
        tar_kps, report.tar = self.extract_timed(tar_volume)
        out, report.match = match_timed(ref_kps, tar_kps, threshold, mode)
        return out, report


def build2sigma(volume, cfg: SiftConfig | None = None, factor: int = 4):
    """Smooth-then-downsample consistency image (CSIFT3D::test_build2sigma,
    Src/cSIFT3D.cc:322-343): take GSS level (0, 1) at sigma 1.6, smooth it
    by sqrt((1.6*factor)^2 - 1.6^2) in one step, then downsample twice —
    producing the volume at 1/factor resolution with total blur
    1.6*factor. Comparing this against the pyramid's own octave-path level
    validates the incremental-sigma schedule (blurs compose in quadrature
    and commute with downsampling up to resampling error)."""
    cfg = cfg or SiftConfig()
    plan = make_plan(cfg, tuple(int(s) for s in volume.shape))

    sig_prev = 1.6
    sig_total = 1.6 * factor
    sig = float(np.sqrt(sig_total ** 2 - sig_prev ** 2))

    @jax.jit
    def go(v):
        v = G.data_scale(v.astype(jnp.float32))
        lvl0 = G.gaussian_blur(v, plan.base_sig)          # GSS (0,0), sigma0
        lvl1 = G.gaussian_blur(lvl0, plan.sigmas[1])      # GSS (0,1), 1.6
        big = G.gaussian_blur(lvl1, sig)
        half = G.downsample(big)
        return G.downsample(half)

    return go(jnp.asarray(volume, jnp.float32))


def compact_valid(kps: KeypointSet, warn_overflow: bool = True) -> KeypointSet:
    """Slice the valid dense prefix into a power-of-2-bucketed KeypointSet.

    The extraction capacity arrays are mostly empty lanes; matching cost is
    quadratic in row count, so the matcher operates on the compacted sets.
    extract() already sorts valid lanes to a dense prefix on device, so
    compaction is one scalar fetch (the count) plus a static slice — the
    bucket (next power of two) keeps recompilation bounded.
    """
    import warnings

    n, dropped = jax.device_get(_counts_jit(kps))
    if warn_overflow and int(dropped) > 0:
        warnings.warn(
            f"keypoint capacity overflow: {int(dropped)} extrema dropped "
            "by per-level caps; increase SiftConfig.max_kp_per_level",
            RuntimeWarning,
            stacklevel=2,
        )
    return _compact_slice(kps, _next_bucket(n, kps.valid.shape[0]))


@jax.jit
def _counts_jit(kps: KeypointSet):
    """One fused dispatch for the two host-side compaction scalars (the
    eager property reductions each cost a dispatch + sync on the tunnel)."""
    return kps.num_valid, kps.dropped_by_cap


@functools.partial(jax.jit, static_argnames=("bucket",))
def _compact_slice(kps: KeypointSet, bucket: int) -> KeypointSet:
    return KeypointSet(
        *[getattr(kps, f) if f in ("counts", "caps") else getattr(kps, f)[:bucket]
          for f in KeypointSet._fields]
    )


def compact_valid_pair(ref: KeypointSet, tar: KeypointSet, warn_overflow=True):
    """compact_valid for both volumes with ONE host sync: the four scalars
    (two counts, two overflow totals) come back in a single fused fetch
    instead of two round-trips (each costs a full tunnel latency)."""
    import warnings

    (nr, dr), (nt_, dt) = jax.device_get(
        (_counts_jit(ref), _counts_jit(tar))
    )
    for name, dropped in (("ref", dr), ("tar", dt)):
        if warn_overflow and int(dropped) > 0:
            warnings.warn(
                f"keypoint capacity overflow ({name}): {int(dropped)} "
                "extrema dropped by per-level caps; increase "
                "SiftConfig.max_kp_per_level",
                RuntimeWarning,
                stacklevel=2,
            )

    def bucket(n, kps):
        return _compact_slice(kps, _next_bucket(n, kps.valid.shape[0]))

    return bucket(nr, ref), bucket(nt_, tar)


def _next_bucket(n, cap: int) -> int:
    """Compaction bucket: next power of two up to 4096, then next multiple
    of 4096 — pow2 granularity past 32k wastes up to 2x matcher FLOPs on
    padding lanes (35417 keypoints -> a 65536 bucket cost 0.55 s of the
    512^3 pair in the two top-2 matmuls; the 36864 bucket costs ~0.18 s).
    Matching is masked by `valid`, so bucket size never changes results."""
    n = max(int(n), 1)
    if n <= 4096:
        return min(1 << (n - 1).bit_length(), cap)
    return min(-(-n // 4096) * 4096, cap)


# Last-seen compaction buckets per capacity signature. The exact bucket
# needs the valid-count scalars on host — a full tunnel round-trip that
# serialises extract -> fetch -> match (~80-120 ms wall at 256^3). With a
# remembered guess we dispatch compaction + matching immediately at the
# guessed (power-of-2) buckets and fetch the true counts concurrently with
# the device-side match: an OVERSIZED bucket is still correct (the extra
# lanes are valid=False and masked by the matcher), so only an undersized
# guess falls back to the exact path. Volumes of similar keypoint density
# share buckets, so steady-state pipelines never pay the sync.
_BUCKET_GUESS: dict[tuple[int, int], tuple[int, int]] = {}
_BUCKET_GUESS_MAX = 32  # bounded: evict oldest capacity signatures


def _remember_bucket(key, val):
    _BUCKET_GUESS.pop(key, None)
    _BUCKET_GUESS[key] = val  # (re)insert most-recent-last
    while len(_BUCKET_GUESS) > _BUCKET_GUESS_MAX:
        _BUCKET_GUESS.pop(next(iter(_BUCKET_GUESS)))


def _match(ref: KeypointSet, tar: KeypointSet, threshold, mode):
    import warnings

    key = (ref.valid.shape[0], tar.valid.shape[0])
    guess = _BUCKET_GUESS.get(key)
    if guess is not None:
        br, bt = guess
        cr, ct = _counts_jit(ref), _counts_jit(tar)
        ref_c = _compact_slice(ref, br)
        tar_c = _compact_slice(tar, bt)
        res = match_descriptors(
            ref_c.desc, tar_c.desc, ref_c.valid, tar_c.valid, threshold,
            mode=mode,
        )
        out = match_coords(ref_c.rxyz, tar_c.rxyz, res)
        (nr, dr), (nt_, dt) = jax.device_get((cr, ct))
        for name, dropped in (("ref", dr), ("tar", dt)):
            if int(dropped) > 0:
                warnings.warn(
                    f"keypoint capacity overflow ({name}): {int(dropped)} "
                    "extrema dropped by per-level caps; increase "
                    "SiftConfig.max_kp_per_level",
                    RuntimeWarning, stacklevel=3,
                )
        _remember_bucket(key, (_next_bucket(nr, key[0]),
                               _next_bucket(nt_, key[1])))
        if int(nr) <= br and int(nt_) <= bt:
            return out
        # guess undersized (keypoints would be dropped): redo exactly

    ref_c, tar_c = compact_valid_pair(ref, tar, warn_overflow=guess is None)
    _remember_bucket(key, (ref_c.valid.shape[0], tar_c.valid.shape[0]))
    res = match_descriptors(
        ref_c.desc, tar_c.desc, ref_c.valid, tar_c.valid, threshold, mode=mode
    )
    return match_coords(ref_c.rxyz, tar_c.rxyz, res)


def enhanced_match(ref: KeypointSet, tar: KeypointSet, threshold: float = 0.85):
    """muBruteMatcher::enhancedMatch equivalent (Src/cMatcher.cc:226-228).

    Returns (ref_coords, tar_coords, valid): dense-bucketed (K, 3) arrays;
    compact with the mask for a dense pair list."""
    return _match(ref, tar, threshold, ENHANCED)


def match_timed(
    ref: KeypointSet,
    tar: KeypointSet,
    threshold: float = 0.85,
    mode: int = ENHANCED,
):
    """Matching with the reference's per-phase timing report
    (muBruteMatcher's match/filter/countMatched/revMatch/revFilter/
    bijectFilter/converse counters, Include/cMatcher.h:60-67,
    Src/cMatcher.cc:148-213). Returns ((ref_coords, tar_coords, valid),
    SiftTimer); pair results are identical to the untimed matchers."""
    from .ops.match import match_descriptors_timed
    from .utils.timing import SiftTimer

    timer = SiftTimer()
    with timer.stage("compact"):
        ref_c = compact_valid(ref)
        tar_c = compact_valid(tar)
        jax.block_until_ready((ref_c, tar_c))
    res, timer = match_descriptors_timed(
        ref_c.desc, tar_c.desc, ref_c.valid, tar_c.valid, threshold,
        mode=mode, timer=timer,
    )
    with timer.stage("converse"):
        out = match_coords(ref_c.rxyz, tar_c.rxyz, res)
        jax.block_until_ready(out)
    return out, timer


def inject_match(ref: KeypointSet, tar: KeypointSet, threshold: float = 0.85):
    from .ops.match import INJECT

    return _match(ref, tar, threshold, INJECT)


def biject_match(ref: KeypointSet, tar: KeypointSet, threshold: float = 0.85):
    from .ops.match import BIJECT

    return _match(ref, tar, threshold, BIJECT)
