"""BVH8 path: 8-wide greedy collapse + width-generalized supernode kernel.

Our TPU-native extension beyond the reference's fixed 4-wide collapse
(PathTracer.js:506-667): halve record visits on the scalar-issue-bound
consume loop by doubling the child slots per record. Correctness is pinned
the same way as the 4-wide path — structural invariants vs the BVH2, then
exact tri-id parity vs the brute-force oracle through both kernels.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.models.scene import Scene
from raytracer_tpu.ops.camera import generate_rays
from raytracer_tpu.ops.collapse import (
    INVALID,
    LEAF_FLAG,
    _decode_bounds,
    collapse_lbvh2_to_bvh8,
)
from raytracer_tpu.ops.lbvh import build_lbvh2
from raytracer_tpu.ops.pallas.traverse import (
    infer_rec_width,
    make_qnodes,
    rec_layout,
    trace_rays_pallas,
    trace_tiles_pallas,
)
from raytracer_tpu.ops.trace import make_wide_bvh, trace_rays_brute
from raytracer_tpu.utils import procgen

CAM_POS = jnp.array([0.15, -0.1, 2.5], jnp.float32)
CAM_QUAT = jnp.array([0.0, 0.1, 0.0, 0.9949874], jnp.float32)


def _scene_tris(n_sub=2, trim=0):
    tris_np = procgen.make_icosphere(n_sub)
    if trim:
        tris_np = tris_np[:-trim]
    scene = Scene().set_triangles(tris_np)
    scene._normalize_enabled, scene._normalize_mode = True, "cube"
    scene.normalize_mesh()
    return jnp.asarray(scene.triangles)


def test_rec_layout_width8_roundtrip():
    for k in (1, 2, 8, 32):
        vb4, ib4, r4 = rec_layout(k, 4)
        vb8, ib8, r8 = rec_layout(k, 8)
        assert (vb4, ib4) == (32, 32 + 48 * k)   # unchanged 4-wide layout
        assert (vb8, ib8) == (64, 64 + 96 * k)
        assert infer_rec_width(k, r4) == 4
        assert infer_rec_width(k, r8) == 8
    with pytest.raises(ValueError):
        infer_rec_width(1, 999)


def test_collapse8_structure():
    """Every BVH2 leaf appears exactly once under the BVH8 root; every
    node's decoded box contains its children's boxes."""
    tris = _scene_tris(2)
    bvh2 = build_lbvh2(tris)
    b8 = collapse_lbvh2_to_bvh8(bvh2)
    n = int(b8.num_nodes)
    kids = np.asarray(b8.children)[:n]
    meta = np.asarray(b8.meta)[:n]
    leaf = (meta & LEAF_FLAG) != 0

    # walk from the root, count leaf occurrences
    seen = np.zeros(n, np.int32)
    stack = [0]
    while stack:
        i = stack.pop()
        seen[i] += 1
        if not leaf[i]:
            ks = kids[i]
            ks = ks[ks != INVALID]
            assert len(ks) >= 2          # internal nodes keep ≥2 children
            stack.extend(int(x) for x in ks)
    assert (seen <= 1).all()             # pre-order emission: no sharing
    assert seen.sum() == n               # every emitted row is reachable
    n_leaves = int(leaf.sum())
    assert n_leaves == tris.shape[0]

    # containment in decoded f32 space
    mn, mx = (np.asarray(a) for a in _decode_bounds(b8.bounds_u32[:n]))
    for i in range(n):
        if leaf[i]:
            continue
        for k in kids[i]:
            if k == INVALID:
                continue
            assert (mn[i] <= mn[k] + 1e-6).all() and (mx[i] >= mx[k] - 1e-6).all()

    # 8-wide trees are strictly shallower record-wise: fewer internal nodes
    # than the 4-wide greedy collapse would emit is not guaranteed, but the
    # internal count must be < the BVH2's internal count / 2 + slack
    assert n - n_leaves <= (tris.shape[0] - 1 + 2) // 2


@pytest.mark.parametrize("k", [1, pytest.param(8, marks=pytest.mark.full)])
def test_bvh8_kernel_parity_vs_brute(k):
    """Exact tri-id parity of the 8-wide record path through BOTH kernels
    (tile + ray-buffer), K=1 and packed K=8 leaves. The quick tier runs
    the K=1 case on a small scene/frame (interpret-mode while_loops are
    minutes-per-megapixel on CPU); the full tier covers packed leaves at
    the standard parity size."""
    if k == 1:
        tris = _scene_tris(1)
        wide = make_wide_bvh(collapse_lbvh2_to_bvh8(build_lbvh2(tris)))
        qn = make_qnodes(wide, tris)
    else:
        from raytracer_tpu.ops.cluster import build_lbvh2_clustered

        tris = _scene_tris(2, trim=3)    # tail cluster masked
        cs = build_lbvh2_clustered(tris, leaf_size=k)
        wide = make_wide_bvh(collapse_lbvh2_to_bvh8(cs.bvh2))
        qn = make_qnodes(wide, cs.tris_sorted, tri_ids=cs.tri_order,
                         leaf_size=k)
    assert qn.shape[1] * qn.shape[2] == rec_layout(k, 8)[2]

    w, h = (64, 32) if k == 1 else (96, 64)
    t, nx, ny, nz, tri = trace_tiles_pallas(
        qn, CAM_POS, CAM_QUAT, w, h, interpret=True, leaf_k=k
    )
    o, d = generate_rays(w, h, CAM_POS, CAM_QUAT)
    bt, btri = trace_rays_brute(tris, o.reshape(-1, 3), d.reshape(-1, 3))
    bt = np.asarray(bt).reshape(h, w)
    btri = np.asarray(btri).reshape(h, w)
    assert (np.asarray(tri) == btri).all()
    hit = btri >= 0
    assert np.allclose(np.asarray(t)[hit], bt[hit], rtol=1e-5)

    # ray-buffer kernel (bounce waves / shadow rays), incl. any-hit
    ob, db = o.reshape(-1, 3)[:512], d.reshape(-1, 3)[:512]
    rt, _, _, _, rtri = trace_rays_pallas(qn, ob, db, interpret=True, leaf_k=k)
    rbt, rbtri = trace_rays_brute(tris, ob, db)
    assert (np.asarray(rtri) == np.asarray(rbtri)).all()
    _, _, _, _, otri = trace_rays_pallas(qn, ob, db, interpret=True,
                                         leaf_k=k, any_hit=True)
    assert ((np.asarray(otri) >= 0) == (np.asarray(rbtri) >= 0)).all()
