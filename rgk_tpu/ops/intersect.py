"""Ray-scene intersection: GEMM-form brute force and BVH traversal.

Replaces the reference's kd-tree traversal kernels (reference
src/scene_intersect.cpp) with TPU-friendly equivalents:

* `intersect_brute` — the whole-scene sweep in *affine/GEMM form*:
  per-triangle Badouel coefficients (scene/builder.build_tri_pack)
  make hit t and both barycentrics affine in (ro, t*rd), so the test
  is 6 thin [R,3]x[3,M] matmuls plus an elementwise mask/argmin over
  [R, M] — no [R, M, 3] vector temporaries, which is what makes the
  naive Möller-Trumbore sweep HBM-bound on TPU.  For the analytic
  scene corpus (tens to thousands of triangles) this is faster than
  any tree.
* `intersect_bvh` — stackless skip-link traversal of the flattened
  BVH (scene/bvh.py) inside a `lax.while_loop`; leaves evaluate the
  same Badouel coefficients gathered per lane.

Both support the reference's self-intersection avoidance (`exclude` =
index of the triangle the ray starts on, scene_intersect.cpp
FindIntersectKdOtherThan) and an any-hit mode for shadow rays.

Hit records are (t, tri_idx, bary_b, bary_c); barycentric weight of
vertex A = 1 - b - c (matching the reference's Intersection fields,
src/primitives.hpp:98-109).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import vecmath as vm

# Plain float, NOT jnp.float32: a module-level concrete array would
# initialize the JAX backend at import time, breaking later platform
# selection (e.g. the CLI's --cpu).
BIG = 3.4e38
_PARALLEL_EPS = 1e-9


class Hit(NamedTuple):
    t: jnp.ndarray        # f32 [...]; BIG when no hit
    tri: jnp.ndarray      # int32 [...]; -1 when no hit
    bary_b: jnp.ndarray   # f32 [...]
    bary_c: jnp.ndarray   # f32 [...]

    @property
    def valid(self):
        return self.tri >= 0


def intersect_brute(scene, ro, rd, t_min, t_max, exclude=None,
                    any_hit: bool = False) -> Hit:
    """Closest hit over all triangles in GEMM form.

    ro, rd: [R,3]; t_min/t_max: scalars or [R]; exclude: int32 [R] or
    None.  Peak memory: a few [R, M] float planes.
    """
    pack = scene.tri_pack                     # [M,12]
    n_t = pack[:, 0:4]                        # n.xyz, d
    bcoef = pack[:, 4:8]                      # b0, bv.xyz
    gcoef = pack[:, 8:12]                     # g0, gv.xyz

    rddn = rd @ n_t[:, 0:3].T                             # [R,M]
    rodn = ro @ n_t[:, 0:3].T + n_t[:, 3][None, :]        # n.ro + d
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -rodn / jnp.where(safe, rddn, 1.0)

    ro_b = ro @ bcoef[:, 1:4].T + bcoef[:, 0][None, :]
    rd_b = rd @ bcoef[:, 1:4].T
    beta = ro_b + t * rd_b
    ro_g = ro @ gcoef[:, 1:4].T + gcoef[:, 0][None, :]
    rd_g = rd @ gcoef[:, 1:4].T
    gamma = ro_g + t * rd_g

    t_min_b = jnp.asarray(t_min)[..., None] if jnp.ndim(t_min) else t_min
    t_max_b = jnp.asarray(t_max)[..., None] if jnp.ndim(t_max) else t_max
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > t_min_b) & (t < t_max_b))
    if pack.shape[1] > 12:
        # Thin-glass triangles never block (see builder
        # append_thinglass_column).
        ok = ok & (pack[:, 12] < 0.5)[None, :]
    if exclude is not None:
        m = jnp.arange(pack.shape[0], dtype=jnp.int32)[None, :]
        ok = ok & (m != exclude[:, None])

    t = jnp.where(ok, t, BIG)
    # Winner extraction via masked reductions, NOT row-gathers:
    # t/beta/gamma are computed values, and XLA fuses producers into
    # gathers — turning `beta[lane, idx]` into a per-lane scalar
    # recomputation of the whole row (measured 1000x slower on TPU).
    best_t = jnp.min(t, axis=1)
    idx = jnp.argmin(t, axis=1).astype(jnp.int32)
    onehot = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) == idx[:, None]
    found = best_t < BIG
    return Hit(
        t=best_t,
        tri=jnp.where(found, idx, -1),
        bary_b=jnp.where(found,
                         jnp.sum(jnp.where(onehot, beta, 0.0), axis=1), 0.0),
        bary_c=jnp.where(found,
                         jnp.sum(jnp.where(onehot, gamma, 0.0), axis=1), 0.0),
    )


def _pack_test(pack_rows, ro, rd, t_min, t_max):
    """Badouel test for per-lane gathered coefficient rows [...,12]."""
    n = pack_rows[..., 0:3]
    d = pack_rows[..., 3]
    rddn = vm.dot(rd, n)
    safe = jnp.abs(rddn) > _PARALLEL_EPS
    t = -(vm.dot(ro, n) + d) / jnp.where(safe, rddn, 1.0)
    p = ro + t[..., None] * rd
    beta = pack_rows[..., 4] + vm.dot(p, pack_rows[..., 5:8])
    gamma = pack_rows[..., 8] + vm.dot(p, pack_rows[..., 9:12])
    ok = (safe & (beta >= 0.0) & (gamma >= 0.0) & (beta + gamma <= 1.0)
          & (t > t_min) & (t < t_max))
    if pack_rows.shape[-1] > 12:
        ok = ok & (pack_rows[..., 12] < 0.5)
    return ok, t, beta, gamma


def intersect_bvh(scene, ro, rd, t_min, t_max, exclude=None,
                  any_hit: bool = False, leaf_size: int = 4) -> Hit:
    """Stackless skip-link BVH traversal in a lax.while_loop.

    Node layout (scene/bvh.py): depth-first order; `meta = (first,
    count, skip)`.  Inner nodes have count == 0 and `first` = index of
    the left child; `skip` = node to jump to when the subtree is
    culled.  Every lane walks its own cursor — no per-lane stack
    memory, so live state is 2 int32 + the hit record per lane
    regardless of tree depth.
    """
    # Traversal is non-differentiable by design (SURVEY §7.6: fixed
    # hit geometry, stop-gradient through Hit): detach the ray inputs
    # so reverse-mode AD treats the while_loop as a constant instead
    # of failing on its dynamic trip count.  Hit geometry depends
    # only on scene GEOMETRY, never on the trainable material/light/
    # texture parameters, so FD gradients still match.
    ro = jax.lax.stop_gradient(ro)
    rd = jax.lax.stop_gradient(rd)
    t_min = jax.lax.stop_gradient(t_min)
    t_max = jax.lax.stop_gradient(t_max)

    node_min = scene.bvh.node_min
    node_max = scene.bvh.node_max
    node_meta = scene.bvh.node_meta
    prim_idx = scene.bvh.prim_idx
    pack = scene.tri_pack

    n_nodes = node_meta.shape[0]
    R = ro.shape[0]

    inv_d = 1.0 / jnp.where(jnp.abs(rd) > 1e-20, rd,
                            jnp.where(rd >= 0, 1e-20, -1e-20))

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (R,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    if exclude is None:
        exclude = jnp.full((R,), -1, jnp.int32)

    def slab(node, best_t):
        bmin = node_min[node]
        bmax = node_max[node]
        t0 = (bmin - ro) * inv_d
        t1 = (bmax - ro) * inv_d
        tn = jnp.minimum(t0, t1).max(axis=-1)
        tf = jnp.maximum(t0, t1).min(axis=-1)
        return (tf >= tn) & (tf >= t_min) & (tn <= jnp.minimum(best_t, t_max))

    def leaf_test(node, active, state):
        best_t, best_tri, bb, bc = state
        first = node_meta[node, 0]
        count = node_meta[node, 1]
        for k in range(leaf_size):
            slot = jax.lax.optimization_barrier(
                jnp.clip(first + k, 0, prim_idx.shape[0] - 1))
            pid = jax.lax.optimization_barrier(prim_idx[slot])
            ok, t, beta, gamma = _pack_test(pack[pid], ro, rd, t_min,
                                            jnp.minimum(best_t, t_max))
            ok = ok & active & (k < count) & (pid != exclude)
            best_tri = jnp.where(ok, pid, best_tri)
            bb = jnp.where(ok, beta, bb)
            bc = jnp.where(ok, gamma, bc)
            best_t = jnp.where(ok, t, best_t)
        return best_t, best_tri, bb, bc

    def cond(state):
        node, _, _, _, _, done = state
        return jnp.any(~done)

    def body(state):
        node, best_t, best_tri, bb, bc, done = state
        nodec = jax.lax.optimization_barrier(
            jnp.clip(node, 0, n_nodes - 1))
        active = ~done
        count = node_meta[nodec, 1]
        hit_box = slab(nodec, best_t) & active
        is_leaf = (count > 0) & hit_box

        best_t, best_tri, bb, bc = leaf_test(
            nodec, is_leaf, (best_t, best_tri, bb, bc))

        descend = hit_box & (count == 0)
        nxt = jnp.where(descend, node_meta[nodec, 0], node_meta[nodec, 2])
        nxt = jnp.where(active, nxt, node)
        done2 = done | (nxt >= n_nodes)
        if any_hit:
            done2 = done2 | (best_tri >= 0)
        return nxt, best_t, best_tri, bb, bc, done2

    init = (
        jnp.zeros((R,), jnp.int32),
        jnp.broadcast_to(BIG, (R,)),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), jnp.float32),
        jnp.zeros((R,), bool),
    )
    _, best_t, best_tri, bb, bc, _ = jax.lax.while_loop(cond, body, init)
    found = best_tri >= 0
    return Hit(t=jnp.where(found, best_t, BIG), tri=best_tri,
               bary_b=bb, bary_c=bc)


def _backend() -> str:
    """Effective backend at trace time: honors jax.default_device
    (used e.g. by bench.py's TPU-vs-CPU parity gate) before falling
    back to the process default."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax_default_device accepts a Device or a platform string.
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


def make_intersector(meta):
    """Pick the intersection routine for a committed scene.

    Flat scenes use the Pallas VMEM-resident kernel on TPU and the
    GEMM sweep elsewhere; BVH scenes use the stackless traversal.
    """
    if meta.has_bvh:
        def tree(scene, ro, rd, t_min, t_max, exclude=None,
                 any_hit=False):
            if _backend() == "tpu":
                import os

                from .pallas_cluster import (DEFAULT_BLOCK,
                                             intersect_clusters)
                # Binned (walk-emit + dense chunk sweeps) vs union
                # traversal: the binned pipeline wins heavily
                # divergent regimes (sorted-random +13%, shadow fans
                # +50-74% at 1M tris) but its XLA glue (pair sort +
                # gathers, ~R*K elements per call) is a fixed cost
                # that loses the real wavefront mix, where rays are
                # semi-coherent and many visibility lanes are dead
                # (colonnade e2e 7.1 -> 9.1 s/round with "any").
                # RGK_BINNED: "off" (default) = union only, "any" =
                # binned for any-hit/shadow rays, "all" = both modes.
                mode = os.environ.get("RGK_BINNED", "off")
                if mode == "all" or (mode == "any" and any_hit):
                    from .pallas_binned import intersect_clusters_binned
                    return intersect_clusters_binned(
                        scene, ro, rd, t_min, t_max, exclude=exclude,
                        any_hit=any_hit)
                blk = int(os.environ.get("RGK_CLUSTER_BLOCK",
                                         DEFAULT_BLOCK))
                return intersect_clusters(scene, ro, rd, t_min, t_max,
                                          exclude=exclude,
                                          any_hit=any_hit, block=blk)
            return intersect_bvh(scene, ro, rd, t_min, t_max,
                                 exclude=exclude, any_hit=any_hit)

        return tree

    def flat(scene, ro, rd, t_min, t_max, exclude=None, any_hit=False):
        if _backend() == "tpu":
            from .pallas_intersect import intersect_pallas
            return intersect_pallas(scene, ro, rd, t_min, t_max,
                                    exclude=exclude, any_hit=any_hit)
        return intersect_brute(scene, ro, rd, t_min, t_max,
                               exclude=exclude, any_hit=any_hit)

    return flat


def visibility(scene, intersect_fn, a, b, eps_mult: float = 20.0,
               active=None):
    """Mutual visibility of points a, b: occluded iff any hit in
    (eps*20, |b-a| - eps*20) — reference Scene::Visibility
    (src/scene.cpp:670-673).

    `active` (optional bool [R]) marks lanes whose result is consumed;
    inactive lanes get an empty interval so the cluster kernel packs
    them into no-op blocks instead of tracing garbage shade points.

    The ray is traced FROM b TO a (surface point toward the light for
    NEE): occluders cluster near the surface end, so a front-to-back
    any-hit traversal exits after a handful of clusters instead of
    marching most of the segment (the reference's Visibility traces
    light->point, scene.cpp:670-673, but the predicate is symmetric —
    only the interval ends are epsilon-trimmed)."""
    d = a - b
    dist = vm.length(d)
    rd = d / dist[..., None]
    eps = scene.epsilon * eps_mult
    t_far = dist - eps
    if active is not None:
        t_far = jnp.where(active, t_far, -1.0)
    hit = intersect_fn(scene, b, rd, eps, t_far, any_hit=True)
    return ~hit.valid
