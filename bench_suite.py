"""Full benchmark suite — the five BASELINE.json configurations.

  1. Cornell-box-style low-poly GLB, 256×256, 1 spp, diffuse-only, BVH2 traversal
  2. Stanford-Bunny-class (~80k tris), 512×512, 4 spp, BVH4-wide traversal
  3. Dragon-class (871k tris), 1920×1080, 1 spp progressive (the headline —
     same measurement as bench.py)
  4. Interior scene (Sponza-class geometry) with NEE + 4-bounce paths
  5. Dynamic scene: per-frame BVH refit + multi-camera batch rendering
     (sharded across chips when >1 device is present)

Each config prints one JSON line; stderr carries details. Timing follows
bench.py's honest protocol (on-device frame batching, host-pull barriers).

Usage: python bench_suite.py [--config N] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _scene(tris_np):
    from raytracer_tpu.models.scene import Scene

    s = Scene().set_triangles(tris_np)
    s._normalize_enabled, s._normalize_mode = True, "cube"
    s.normalize_mesh()
    return s


def _time_frames(render_n, args_tuple, frames, reps=3):
    hits = np.asarray(render_n(*args_tuple))  # warm/compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        hits = np.asarray(render_n(*args_tuple))
        times.append((time.perf_counter() - t0) / frames * 1e3)
    return float(np.median(times)), hits


def _emit(name, mrays, ms, extra=None):
    rec = {
        "metric": name,
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 75.0, 3),
        "detail": {"ms_per_frame": round(ms, 3), **(extra or {})},
    }
    print(json.dumps(rec), flush=True)


def config1(frames):
    """Cornell box, 256×256, BVH2 traversal, diffuse primary shading."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.collapse import bvh2_as_bvh4
    from raytracer_tpu.ops.lbvh import build_lbvh2
    from raytracer_tpu.ops.trace import make_wide_bvh
    from raytracer_tpu.render import render_ldr
    from raytracer_tpu.utils import procgen

    s = _scene(procgen.make_cornell_box())
    tris = jnp.asarray(s.triangles)
    wide = make_wide_bvh(bvh2_as_bvh4(build_lbvh2(tris)))
    w = h = 256
    quat = np.array([0, 0, 0, 1], np.float32)
    poss = np.array([[1e-3 * i, 0, 2.2] for i in range(frames)], np.float32)

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from raytracer_tpu.ops.pallas.aot import cached_export
        from raytracer_tpu.ops.pallas.traverse import (
            make_qnodes,
            trace_tiles_batch_pallas,
        )

        qn = make_qnodes(wide, tris)

        # frames are batched on device; the batch size amortizes the
        # per-call relay boundary, which would otherwise dominate this
        # 0.36-ms-of-device-work config: the r5 sweep (tools/mb_c1_batch.py)
        # measured call = 33.1 ms + F × 0.361 ms, so F=64 books 0.52 ms of
        # NON-TPU relay time against every frame. The reference loop has no
        # per-frame readback at all; F=256 leaves ~0.13 ms/frame of boundary.
        n_batch = max(frames, 256)

        def make_render_n():
            def render_n(qn_, poss_):
                # ONE kernel call renders the whole frame batch from a
                # shared tile queue — per-call dispatch (~0.3-0.5 ms) was
                # half this config's frame time (verdict r3 #9); raw layout
                # keeps the count reduction transpose-free
                quats = jnp.broadcast_to(jnp.asarray(quat), (n_batch, 4))
                out = trace_tiles_batch_pallas(qn_, poss_, quats, w, h,
                                               raw=True)
                return jnp.sum(out[:, :, 4] >= 0, axis=(1, 2, 3))
            return render_n

        render_call = cached_export(
            f"suite1_{w}x{h}_f{n_batch}", make_render_n,
            (jax.ShapeDtypeStruct(qn.shape, qn.dtype),
             jax.ShapeDtypeStruct((n_batch, 3), jnp.float32)),
        )
        poss = np.array([[1e-3 * i, 0, 2.2] for i in range(n_batch)], np.float32)
        ms, hits = _time_frames(
            lambda q_, p_: render_call(q_, jnp.asarray(p_)), (qn, poss), n_batch
        )
    else:
        @jax.jit
        def render_n(wide_, tris_, poss_):
            return jax.lax.map(
                lambda p: jnp.sum(render_ldr(wide_, tris_, p, quat, w, h)[2] >= 0),
                poss_,
            )

        ms, hits = _time_frames(render_n, (wide, tris, poss), frames)
    on_tpu_detail = (
        {"batch": n_batch,
         # r5 linear model (tools/mb_c1_batch.py): call = C + F·r — the
         # residual per-frame glue the r4 verdict asked to profile is relay
         # boundary, not device work
         "percall_overhead_ms": 33.1, "device_rate_ms_per_frame": 0.361}
        if on_tpu else {})
    _emit("cornell_256_bvh2", w * h / ms / 1e3, ms,
          {"tris": s.num_triangles, "hit_rate": float(hits[0]) / (w * h),
           **on_tpu_detail})


def _cluster_qnodes(wide, tris, leaf_k=int(os.environ.get("RT_SUITE_LEAF", "32")),
                    split_extent=None):
    """Supernode records for the Pallas ray-buffer path — SAH-snapped
    K-tri clusters when the native builder is available (fewer slab-passing
    leaf slots per visit), single-triangle records otherwise. The caller's
    ``wide``/``tris`` stay untouched: with qnodes present the PT paths
    trace exclusively through the records and report original tri ids.

    ``split_extent`` pre-bisects architectural triangles larger than that
    world extent (utils/meshops.py) so cluster AABBs stay tight; fragments
    still report original ids. Override with RT_SPLIT=<float> (0 disables).
    """
    import jax.numpy as jnp

    from raytracer_tpu.ops.pallas.traverse import make_qnodes

    env_split = os.environ.get("RT_SPLIT")
    if env_split is not None:
        split_extent = float(env_split) or None

    try:
        from raytracer_tpu.ops.cluster import build_sah2_clustered
        from raytracer_tpu.ops.collapse import (collapse_lbvh2_to_bvh4,
                                                collapse_lbvh2_to_bvh8)
        from raytracer_tpu.ops.trace import make_wide_bvh

        # RT_WIDE=8 routes the suite through 8-wide records (half the
        # record visits on whole-tree divergent walks — tools/mb_bvh8.py)
        collapse = (collapse_lbvh2_to_bvh8
                    if os.environ.get("RT_WIDE") == "8"
                    else collapse_lbvh2_to_bvh4)

        tri_in, orig_ids = tris, None
        if split_extent:
            from raytracer_tpu.utils.meshops import split_large_triangles

            frags, orig_ids = split_large_triangles(np.asarray(tris),
                                                    split_extent)
            log(f"[suite] split {tris.shape[0]} tris -> {len(frags)} "
                f"fragments (extent > {split_extent})")
            tri_in = jnp.asarray(frags)

        cs, h = build_sah2_clustered(tri_in, leaf_size=leaf_k)
        wide_c = make_wide_bvh(collapse(cs.bvh2, sweeps=h + 2))
        tri_ids = cs.tri_order
        if orig_ids is not None:
            tri_ids = jnp.asarray(orig_ids)[cs.tri_order.astype(jnp.int32)]
        return make_qnodes(wide_c, cs.tris_sorted, tri_ids=tri_ids,
                           leaf_size=leaf_k), leaf_k
    except Exception as e:
        log(f"[suite] SAH clusters unavailable ({e}); single-tri records")
        return make_qnodes(wide, tris), 1


def config2(frames):
    """Bunny-class icosphere (~82k tris), 512×512, 4 spp jittered, BVH4-wide."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.collapse import promote_lbvh2_to_bvh4_wide
    from raytracer_tpu.ops.lbvh import build_lbvh2
    from raytracer_tpu.ops.trace import make_wide_bvh
    from raytracer_tpu.render_pt import pt_sample_frame
    from raytracer_tpu.utils import procgen

    s = _scene(procgen.make_icosphere(6))
    tris = jnp.asarray(s.triangles)
    wide = make_wide_bvh(promote_lbvh2_to_bvh4_wide(build_lbvh2(tris)))
    w = h = 512
    spp = 4
    quat = np.array([0, 0, 0, 1], np.float32)
    pos = np.array([0, 0, 2.8], np.float32)

    import jax as _jax
    qn = None
    leaf_k = 1
    if _jax.default_backend() != "cpu":
        qn, leaf_k = _cluster_qnodes(wide, tris)

    # Frames are batched ON DEVICE inside one exported call (lax.scan over
    # per-frame seeds): each exported-call boundary costs ~50-75 ms of axon
    # relay overhead (PERF.md round-3 #13) — non-TPU time that a per-frame
    # call loop would book against the kernel. The reference benchmark is a
    # continuous render loop with no per-frame readback, so batch timing is
    # the apples-to-apples measurement; every frame's output stays
    # data-dependent (per-frame sums are consumed).
    nb = int(os.environ.get("RT_SUITE_BATCH", "32"))

    def make_render_frame():
        def render_frame(wide_, tris_, qn_, seed):
            def sample(seed_i):
                img, st = pt_sample_frame(
                    wide_, tris_, pos, quat, jax.random.key(seed_i), w, h,
                    bounces=1, qnodes=qn_, leaf_k=leaf_k, stats=True,
                    tile_primary=qn_ is not None,
                )
                return jnp.sum(img), st["alive_rays"]

            def frame(carry, i):
                s, a = carry
                acc = jnp.float32(0)
                alive = jnp.int32(0)
                for j in range(spp):
                    si, ai = sample(seed + i * spp + j)
                    acc = acc + si
                    alive = alive + ai
                return (s + acc / spp, a + alive), 0

            (total, alive), _ = jax.lax.scan(
                frame, (jnp.float32(0), jnp.int32(0)), jnp.arange(nb))
            return total, alive
        return render_frame

    if qn is not None:
        from raytracer_tpu.ops.pallas.aot import cached_export

        _call = cached_export(
            f"suite2_{w}x{h}_spp{spp}_k{leaf_k}_nb{nb}", make_render_frame,
            (jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), wide),
             jax.ShapeDtypeStruct(tris.shape, tris.dtype),
             jax.ShapeDtypeStruct(qn.shape, qn.dtype),
             jax.ShapeDtypeStruct((), jnp.int32)),
        )

        def render_frame(wide_, tris_, seed):
            return _call(wide_, tris_, qn, jnp.int32(seed))
    else:
        _jit = jax.jit(make_render_frame())

        def render_frame(wide_, tris_, seed):
            return _jit(wide_, tris_, qn, seed)

    # warm + honest alive-ray accounting (verdict r2 #2) in one call
    _, alive = render_frame(wide, tris, 0)
    alive = int(np.asarray(alive)) / nb
    calls = max(1, frames // nb)
    t0 = time.perf_counter()
    for i in range(calls):
        v = render_frame(wide, tris, (i + 1) * 1000)[0]
    _ = np.asarray(v)
    ms = (time.perf_counter() - t0) / (calls * nb) * 1e3
    # NEE shadow rays double the ray count per spp
    _emit("bunny_512_4spp_bvh4wide", w * h * spp * 2 / ms / 1e3, ms,
          {"tris": s.num_triangles, "spp": spp, "batch": nb,
           "frames": calls * nb,  # actual count measured (CLI --frames
                                  # rounds to whole nb-frame batches)
           "alive_mrays_per_s": round(alive / ms / 1e3, 2)})


def config4(frames):
    """Interior (Sponza-class procedural hall), NEE + 4-bounce paths, 512×512."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
    from raytracer_tpu.ops.lbvh import build_lbvh2
    from raytracer_tpu.ops.trace import make_wide_bvh
    from raytracer_tpu.render_pt import pt_sample_frame
    from raytracer_tpu.utils import procgen

    # interior hall: cornell box + colonnade of boxes + high-poly centerpiece
    parts = [procgen.make_cornell_box(4.0)]
    for i in range(8):
        c = procgen.make_cube(0.3) + np.array(
            [(-1.5 + 0.4 * i), -1.6, (-1.2 if i % 2 else 1.2)], np.float32
        )
        parts.append(c)
    parts.append(procgen.make_icosphere(4, radius=0.7))
    s = _scene(np.concatenate(parts).astype(np.float32))
    tris = jnp.asarray(s.triangles)
    wide = make_wide_bvh(collapse_lbvh2_to_bvh4(build_lbvh2(tris)))
    w = h = 512
    bounces = 4
    quat = np.array([0, 0, 0, 1], np.float32)
    pos = np.array([0, 0, 0.8], np.float32)

    qn = None
    leaf_k = 1
    if jax.default_backend() != "cpu":
        qn, leaf_k = _cluster_qnodes(wide, tris)

    # on-device frame batch — one exported call per nb frames (see config2's
    # batching note: the ~50-75 ms axon per-call boundary is not TPU time)
    nb = int(os.environ.get("RT_SUITE_BATCH", "32"))
    # Between-wave compaction measured NEGATIVE here in round 5 (the
    # argsort+gather glue costs more than the stream coherence it buys now
    # that waves run in tile-block lane order with lane parking — PERF.md
    # r5 #2: 76.2 vs 98.6 ms/frame). RT_PT_COMPACT=1 restores it.
    compact = qn is not None and os.environ.get("RT_PT_COMPACT", "0") == "1"

    def make_render_frame():
        def render_frame(wide_, tris_, qn_, seed):
            def frame(carry, i):
                s, a = carry
                sfr, st = pt_sample_frame(
                    wide_, tris_, pos, quat, jax.random.key(seed + i), w, h,
                    bounces=bounces, qnodes=qn_, compact=compact,
                    leaf_k=leaf_k, stats=True, tile_primary=qn is not None,
                )
                return (s + jnp.sum(sfr), a + st["alive_rays"]), 0

            (total, alive), _ = jax.lax.scan(
                frame, (jnp.float32(0), jnp.int32(0)), jnp.arange(nb))
            return total, alive
        return render_frame

    if qn is not None:
        from raytracer_tpu.ops.pallas.aot import cached_export

        _call = cached_export(
            f"suite4_{w}x{h}_b{bounces}_k{leaf_k}_nb{nb}"
            + ("" if compact else "_nc"), make_render_frame,
            (jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), wide),
             jax.ShapeDtypeStruct(tris.shape, tris.dtype),
             jax.ShapeDtypeStruct(qn.shape, qn.dtype),
             jax.ShapeDtypeStruct((), jnp.int32)),
        )

        def render_frame(wide_, tris_, seed):
            return _call(wide_, tris_, qn, jnp.int32(seed))
    else:
        _jit = jax.jit(make_render_frame())

        def render_frame(wide_, tris_, seed):
            return _jit(wide_, tris_, qn, seed)

    _, alive = render_frame(wide, tris, 0)
    alive = int(np.asarray(alive)) / nb
    calls = max(1, frames // nb)
    t0 = time.perf_counter()
    for i in range(calls):
        v = render_frame(wide, tris, (i + 1) * 1000)[0]
    _ = np.asarray(v)
    ms = (time.perf_counter() - t0) / (calls * nb) * 1e3
    # each bounce wave traces path + shadow rays
    rays = w * h * bounces * 2
    _emit("interior_nee_4bounce", rays / ms / 1e3, ms,
          {"tris": s.num_triangles, "bounces": bounces, "batch": nb,
           "frames": calls * nb,
           "alive_mrays_per_s": round(alive / ms / 1e3, 2)})


def config5(frames):
    """Dynamic: per-frame refit of deforming geometry + camera batch render
    (sharded across all available devices)."""
    import jax
    import jax.numpy as jnp

    from raytracer_tpu.ops.collapse import collapse_lbvh2_to_bvh4
    from raytracer_tpu.ops.lbvh import build_lbvh2, refit_lbvh2
    from raytracer_tpu.ops.trace import make_wide_bvh
    from raytracer_tpu.parallel.mesh import make_mesh, render_cameras_sharded
    from raytracer_tpu.utils import procgen

    s = _scene(procgen.make_icosphere(4))
    tris0 = jnp.asarray(s.triangles)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    w = h = 256
    # BASELINE config 5 is "multi-camera BATCH rendering" — the batch is
    # what amortizes the per-frame refit chain; 8 cameras/chip models a
    # production multi-view step (cameras reported in detail)
    n_cam = max(4 * n_dev, 8) if jax.default_backend() != "cpu" else max(n_dev, 2)
    poss = np.tile(np.array([0, 0, 3.0], np.float32), (n_cam, 1))
    poss[:, 0] = np.linspace(-0.3, 0.3, n_cam)
    quats = np.tile(np.array([0, 0, 0, 1], np.float32), (n_cam, 1))

    @jax.jit
    def step(bvh_, tris_, phase):
        # deform: breathing sphere
        deformed = tris_ * (1.0 + 0.1 * jnp.sin(phase))
        refit = refit_lbvh2(bvh_, deformed)
        wide = make_wide_bvh(collapse_lbvh2_to_bvh4(refit))
        return wide, deformed

    on_tpu_single = jax.default_backend() != "cpu" and n_dev == 1

    if on_tpu_single:
        # Production path (verdict r2 #3): SAH-snapped clusters built ONCE;
        # each frame refits the packed-cluster tree on device (topology +
        # cluster contract kept), rebuilds the supernode records, and traces
        # every camera through the persistent Pallas kernel — all inside one
        # exported program (ops/pallas/aot.py).
        from raytracer_tpu.ops.cluster import (
            build_lbvh2_clustered,
            refit_lbvh2_clustered,
        )
        from raytracer_tpu.ops.pallas.aot import cached_export
        from raytracer_tpu.ops.pallas.traverse import (
            make_qnodes,
            trace_tiles_batch_pallas,
        )

        leaf_k = int(os.environ.get("RT_SUITE_LEAF", "32"))
        sweeps = None
        try:
            from raytracer_tpu.ops.cluster import build_sah2_clustered

            cs, hgt = build_sah2_clustered(tris0, leaf_size=leaf_k)
            sweeps = hgt + 2
        except Exception as e:
            log(f"[suite] SAH clusters unavailable ({e}); Morton clusters")
            leaf_k = min(leaf_k, 8)
            cs = build_lbvh2_clustered(tris0, leaf_size=leaf_k)
        poss_j = jnp.asarray(poss)
        quats_j = jnp.asarray(quats)

        # nb frames per exported call (each frame = refit + records + n_cam
        # traces) — the per-call axon boundary is not TPU time (see config2)
        nb = int(os.environ.get("RT_SUITE_BATCH", "32"))

        def make_frame_fn():
            def frame_fn(bounds, left, right, meta, parent, order, tris_,
                         pchildren, pmeta, psrc, pemitted, pnum, phase0):
                from raytracer_tpu.ops.cluster import ClusteredScene
                from raytracer_tpu.ops.collapse import (
                    CollapsePlan,
                    collapse_apply_refit,
                )
                from raytracer_tpu.ops.lbvh import LBVH2

                plan = CollapsePlan(pchildren, pmeta, psrc, pemitted, pnum)

                def refit_one(phase):
                    """Per-frame refit → records. The collapse topology is
                    static under refit, so the four fixed-point sweeps run
                    ONCE at build time (collapse_plan) and each frame is just
                    the refit sweep + a bounds gather (collapse_apply_refit,
                    bit-identical — tests/test_collapse.py)."""
                    cs_ = ClusteredScene(
                        LBVH2(bounds_u32=bounds, left=left, right=right,
                              meta=meta, parent=parent),
                        tris_, order, leaf_k,
                    )
                    deformed = tris_ * (1.0 + 0.1 * jnp.sin(phase))
                    cs_r = refit_lbvh2_clustered(cs_, deformed,
                                                 num_sweeps=sweeps)
                    bvh4 = collapse_apply_refit(plan, cs_r.bvh2.bounds_u32)
                    wide_ = make_wide_bvh(bvh4)
                    return make_qnodes(wide_, cs_r.tris_sorted,
                                       tri_ids=cs_r.tri_order,
                                       leaf_size=leaf_k)

                # the refit→collapse→widen→records chain is ~5 ms of SMALL
                # ops per frame (PERF.md r3 #10) — vmap it across the whole
                # batch so every op runs nb× wider, then trace frames off
                # the stacked qnodes (trees here are tiny: nb copies fit)
                qn_all = jax.vmap(refit_one)(
                    phase0 + 0.1 * jnp.arange(nb, dtype=jnp.float32))

                def frame(carry, qn):
                    # all n_cam cameras through ONE kernel call (shared tile
                    # queue) — the per-camera dispatch overhead dominated at
                    # 256² (verdict r3 #3)
                    out = trace_tiles_batch_pallas(qn, poss_j, quats_j, w, h,
                                                   leaf_k=leaf_k, raw=True)
                    return carry + jnp.sum(out[:, :, 4] >= 0,
                                           axis=(1, 2, 3)), 0

                hits, _ = jax.lax.scan(
                    frame, jnp.zeros((n_cam,), jnp.int32), qn_all)
                return hits
            return frame_fn

        from raytracer_tpu.ops.collapse import collapse_plan

        b = cs.bvh2
        plan0 = collapse_plan(b, sweeps=sweeps)
        fargs = (b.bounds_u32, b.left, b.right, b.meta, b.parent,
                 cs.tri_order, tris0,
                 plan0.children, plan0.meta, plan0.src, plan0.emitted,
                 plan0.num_nodes)
        frame_call = cached_export(
            f"suite5_refitplan_{w}x{h}_k{leaf_k}_c{n_cam}_nb{nb}",
            make_frame_fn,
            tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in fargs)
            + (jax.ShapeDtypeStruct((), jnp.float32),),
        )

        def frame(i):
            # step by the whole batch span: each call's scan internally
            # renders phases phase0 + 0.1*[0..nb), so consecutive calls must
            # advance by nb*0.1 or they replay nb−1 of the same deformation
            # states (ADVICE r3)
            return frame_call(*fargs, jnp.float32(i * nb * 0.1))
    else:
        nb = 1
        bvh = build_lbvh2(tris0)

        def frame(i):
            wide, tris_d = step(bvh, tris0, jnp.float32(i * 0.1))
            return render_cameras_sharded(wide, tris_d, poss, quats, w, h, mesh)

    _ = np.asarray(frame(0)).sum()
    calls = max(1, frames // nb)
    t0 = time.perf_counter()
    for i in range(calls):
        out = frame(i + 1)
    _ = np.asarray(out).sum()
    ms = (time.perf_counter() - t0) / (calls * nb) * 1e3
    rays = w * h * n_cam
    _emit("dynamic_refit_multicam", rays / ms / 1e3, ms,
          {"tris": s.num_triangles, "cameras": n_cam, "devices": n_dev,
           "batch": nb, "frames": calls * nb})


def config3(frames):
    """Delegates to bench.py (the headline dragon measurement).

    Uses bench.py's own default frame batch (128): an 8-frame batch leaves
    ~6-9 ms/frame of axon per-call overhead inside the number (PERF.md
    round-3 #13, round-5 #5) — the suite must measure the same program the
    driver's headline run does."""
    import subprocess

    r = subprocess.run(
        [sys.executable, "bench.py", "--frames", str(max(frames, 128))],
        capture_output=True, text=True,
    )
    sys.stderr.write(r.stderr)
    print(r.stdout.strip())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, default=0, help="1-5, 0 = all")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # self-sufficient like bench.py: build the native SAH library (≈7 s)
    # instead of silently degrading configs to the Morton fallback
    try:
        from raytracer_tpu.native import bvhtool as _bvhtool

        _bvhtool.ensure_built(log=log)
    except Exception as e:
        log(f"[suite] native tooling unavailable: {e}")

    configs = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}
    targets = [args.config] if args.config else [1, 2, 3, 4, 5]
    for c in targets:
        log(f"[suite] running config {c}")
        configs[c](args.frames)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
