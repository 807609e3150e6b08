"""BVH traversal correctness against the brute-force oracle."""

import jax.numpy as jnp
import numpy as np

from rgk_tpu.ops.intersect import intersect_brute, intersect_bvh
from rgk_tpu.scene.arrays import BVHArrays, _f32, _i32
from rgk_tpu.scene.builder import build_tri_pack
from rgk_tpu.scene.bvh import build_bvh


class _MiniScene:
    """Just enough of SceneArrays for the intersectors."""

    def __init__(self, vertices, tri_vidx, bvh=None):
        self.vertices = jnp.asarray(vertices, jnp.float32)
        self.tri_vidx = jnp.asarray(tri_vidx, jnp.int32)
        self.tri_pack = jnp.asarray(
            build_tri_pack(np.asarray(vertices), np.asarray(tri_vidx)))
        self.bvh = bvh
        self.epsilon = jnp.float32(1e-5)


def _random_soup(n_tris, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-spread, spread, (n_tris, 3))
    offsets = rng.normal(0, 0.6, (n_tris, 3, 3))
    verts = (centers[:, None, :] + offsets).reshape(-1, 3).astype(np.float32)
    tris = np.arange(3 * n_tris, dtype=np.int32).reshape(-1, 3)
    return verts, tris


def _random_rays(n, seed=1, spread=12.0):
    rng = np.random.default_rng(seed)
    ro = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_bvh_matches_brute_closest_hit():
    verts, tris = _random_soup(300, seed=3)
    bvh = build_bvh(verts, tris, leaf_size=4)
    scene = _MiniScene(verts, tris, bvh)
    ro, rd = _random_rays(2000, seed=4)

    hb = intersect_brute(scene, ro, rd, 0.0, 1e4)
    hv = intersect_bvh(scene, ro, rd, 0.0, 1e4)

    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hv.tri))
    hit = np.asarray(hb.tri) >= 0
    assert hit.mean() > 0.05, "test scene should produce enough hits"
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hv.t)[hit],
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hb.bary_b)[hit],
                               np.asarray(hv.bary_b)[hit], atol=1e-5)


def test_bvh_exclusion():
    verts, tris = _random_soup(100, seed=5)
    bvh = build_bvh(verts, tris, leaf_size=2)
    scene = _MiniScene(verts, tris, bvh)
    ro, rd = _random_rays(500, seed=6)
    hb = intersect_brute(scene, ro, rd, 0.0, 1e4)
    # Exclude each first hit; neither intersector may return it again.
    excl = hb.tri
    hb2 = intersect_brute(scene, ro, rd, 0.0, 1e4, exclude=excl)
    hv2 = intersect_bvh(scene, ro, rd, 0.0, 1e4, exclude=excl)
    e = np.asarray(excl)
    assert not np.any((np.asarray(hb2.tri) == e) & (e >= 0))
    np.testing.assert_array_equal(np.asarray(hb2.tri), np.asarray(hv2.tri))


def test_bvh_any_hit_agrees_on_occlusion():
    verts, tris = _random_soup(200, seed=7)
    bvh = build_bvh(verts, tris, leaf_size=4)
    scene = _MiniScene(verts, tris, bvh)
    ro, rd = _random_rays(1000, seed=8)
    hb = intersect_brute(scene, ro, rd, 0.1, 20.0)
    hv = intersect_bvh(scene, ro, rd, 0.1, 20.0, any_hit=True)
    np.testing.assert_array_equal(np.asarray(hb.tri) >= 0,
                                  np.asarray(hv.tri) >= 0)


def test_t_window():
    # A single triangle at z = -5; rays from origin pointing -z.
    verts = np.array([[-1, -1, -5], [1, -1, -5], [0, 1, -5]], np.float32)
    tris = np.array([[0, 1, 2]], np.int32)
    scene = _MiniScene(verts, tris)
    ro = jnp.zeros((1, 3))
    rd = jnp.asarray([[0.0, 0.0, -1.0]])
    assert int(intersect_brute(scene, ro, rd, 0.0, 10.0).tri[0]) == 0
    assert int(intersect_brute(scene, ro, rd, 0.0, 4.0).tri[0]) == -1
    assert int(intersect_brute(scene, ro, rd, 6.0, 10.0).tri[0]) == -1


def test_render_brute_vs_bvh(reference_scenes):
    """Cornell box must render identically via brute force and BVH."""
    import numpy as np
    from rgk_tpu.integrator.path import render_image_round
    from rgk_tpu.scene.config import build_scene, load_config

    cfg = load_config(f"{reference_scenes}/cornell-box.json")
    cfg.settings.xres = cfg.settings.yres = 24
    cfg.settings.multisample = 4
    a_brute, meta_b, _ = build_scene(cfg, build_bvh=False)
    cfg2 = load_config(f"{reference_scenes}/cornell-box.json")
    cfg2.settings.xres = cfg2.settings.yres = 24
    cfg2.settings.multisample = 4
    a_bvh, meta_v, _ = build_scene(cfg2, build_bvh=True, bvh_threshold=8)
    assert meta_v.has_bvh
    cam = cfg.get_camera()
    r1, c1, _ = render_image_round(a_brute, meta_b, cfg.settings, cam, 0)
    r2, c2, _ = render_image_round(a_bvh, meta_v, cfg2.settings, cam, 0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2),
                               rtol=1e-4, atol=1e-5)


def test_pallas_flat_matches_brute_multi_tile():
    """Interpret-mode run of the Pallas flat kernel vs the GEMM oracle
    on a soup wider than one M_TILE (regression: the untiled sweep
    OOMed VMEM beyond ~1k triangles)."""
    import jax

    from rgk_tpu.ops.pallas_intersect import (M_TILE, intersect_pallas,
                                              prepare_pack_mp)

    n_tris = M_TILE * 2 + 57  # forces multi-tile merging + a ragged tail
    verts, tris = _random_soup(n_tris, seed=11)
    scene = _MiniScene(verts, tris)
    scene.pack_mp = jnp.asarray(prepare_pack_mp(np.asarray(scene.tri_pack)))
    ro, rd = _random_rays(512, seed=12)

    hb = intersect_brute(scene, ro, rd, 0.0, 1e4)
    hp = intersect_pallas(scene, ro, rd, 0.0, 1e4, block=256,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hp.tri))
    hit = np.asarray(hb.tri) >= 0
    assert hit.mean() > 0.05
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hp.t)[hit],
                               rtol=3e-4, atol=1e-6)
    # exclusion plumbs through the kernel
    hp2 = intersect_pallas(scene, ro, rd, 0.0, 1e4, exclude=hb.tri,
                           block=256, interpret=True)
    e = np.asarray(hb.tri)
    assert not np.any((np.asarray(hp2.tri) == e) & (e >= 0))


def _cluster_scene(n_tris, seed):
    from rgk_tpu.scene.clusters import build_clusters
    verts, tris = _random_soup(n_tris, seed=seed)
    scene = _MiniScene(verts, tris)
    scene.clusters = build_clusters(verts, tris,
                                    np.asarray(scene.tri_pack))
    return scene


def test_cluster_kernel_matches_brute():
    """Interpret-mode cluster-BVH kernel vs the GEMM oracle on a soup
    spanning many clusters (closest hit, exclusion, any-hit)."""
    from rgk_tpu.ops.pallas_cluster import intersect_clusters

    scene = _cluster_scene(1000, seed=21)
    ro, rd = _random_rays(512, seed=22)

    hb = intersect_brute(scene, ro, rd, 0.0, 1e4)
    hc = intersect_clusters(scene, ro, rd, 0.0, 1e4, block=256,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(hb.tri), np.asarray(hc.tri))
    hit = np.asarray(hb.tri) >= 0
    assert hit.mean() > 0.05
    np.testing.assert_allclose(np.asarray(hb.t)[hit], np.asarray(hc.t)[hit],
                               rtol=3e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hb.bary_b)[hit],
                               np.asarray(hc.bary_b)[hit], atol=1e-4)

    # exclusion
    hc2 = intersect_clusters(scene, ro, rd, 0.0, 1e4, exclude=hb.tri,
                             block=256, interpret=True)
    e = np.asarray(hb.tri)
    assert not np.any((np.asarray(hc2.tri) == e) & (e >= 0))

    # any-hit agrees on occlusion
    hb3 = intersect_brute(scene, ro, rd, 0.1, 20.0)
    hc3 = intersect_clusters(scene, ro, rd, 0.1, 20.0, any_hit=True,
                             block=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(hb3.tri) >= 0,
                                  np.asarray(hc3.tri) >= 0)


def test_cluster_kernel_empty_interval_lanes():
    """Lanes with an empty (t_min > t_max) interval — masked-off
    visibility rays, padding — must report no hit and must not
    disturb neighbouring lanes through the coherence sort."""
    from rgk_tpu.ops.pallas_cluster import intersect_clusters

    scene = _cluster_scene(1000, seed=31)
    ro, rd = _random_rays(512, seed=32)

    full = intersect_clusters(scene, ro, rd, 0.0, 1e4, block=256,
                              interpret=True)
    dead = np.arange(512) % 3 == 0
    t_max = jnp.where(jnp.asarray(dead), -1.0, 1e4)
    mixed = intersect_clusters(scene, ro, rd, 0.0, t_max, block=256,
                               interpret=True)
    assert not np.any(np.asarray(mixed.tri)[dead] >= 0)
    live = ~dead
    np.testing.assert_array_equal(np.asarray(full.tri)[live],
                                  np.asarray(mixed.tri)[live])
    hit = np.asarray(full.tri)[live] >= 0
    np.testing.assert_allclose(np.asarray(full.t)[live][hit],
                               np.asarray(mixed.t)[live][hit],
                               rtol=1e-6)


def test_binned_matches_union_kernel():
    """The binned pipeline (walk-emit + dense chunk sweeps,
    ops/pallas_binned.py) must agree with the union cluster kernel
    exactly — same winner, same reported t/barycentrics — across cap
    settings that exercise overflow + the pass-2 window."""
    from rgk_tpu.ops.pallas_binned import intersect_clusters_binned
    from rgk_tpu.ops.pallas_cluster import intersect_clusters

    scene = _cluster_scene(1000, seed=21)
    ro, rd = _random_rays(2048, seed=22)

    hu = intersect_clusters(scene, ro, rd, 0.0, 1e4, block=256,
                            interpret=True)
    for K in (4, 8):  # K=4 overflows often -> pass 2 exercised
        hb = intersect_clusters_binned(scene, ro, rd, 0.0, 1e4,
                                       block=256, K=K, interpret=True)
        np.testing.assert_array_equal(np.asarray(hu.tri),
                                      np.asarray(hb.tri))
        hit = np.asarray(hu.tri) >= 0
        assert hit.mean() > 0.05
        np.testing.assert_allclose(np.asarray(hu.t)[hit],
                                   np.asarray(hb.t)[hit], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(hu.bary_b)[hit],
                                   np.asarray(hb.bary_b)[hit],
                                   atol=1e-5)


def test_binned_exclusion_any_hit_and_windows():
    from rgk_tpu.ops.pallas_binned import intersect_clusters_binned
    from rgk_tpu.ops.pallas_cluster import intersect_clusters

    scene = _cluster_scene(1000, seed=21)
    ro, rd = _random_rays(1024, seed=23)
    hu = intersect_clusters(scene, ro, rd, 0.0, 1e4, block=256,
                            interpret=True)

    # exclusion
    hb = intersect_clusters_binned(scene, ro, rd, 0.0, 1e4,
                                   exclude=hu.tri, block=256, K=4,
                                   interpret=True)
    e = np.asarray(hu.tri)
    assert not np.any((np.asarray(hb.tri) == e) & (e >= 0))

    # any-hit agrees on occlusion inside a finite window
    hu2 = intersect_clusters(scene, ro, rd, 0.1, 20.0, any_hit=True,
                             block=256, interpret=True)
    hb2 = intersect_clusters_binned(scene, ro, rd, 0.1, 20.0,
                                    any_hit=True, block=256, K=4,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(hu2.tri) >= 0,
                                  np.asarray(hb2.tri) >= 0)

    # dead lanes (empty interval) report no hit, neighbours unchanged
    dead = np.arange(1024) % 3 == 0
    t_max = jnp.where(jnp.asarray(dead), -1.0, 1e4)
    hb3 = intersect_clusters_binned(scene, ro, rd, 0.0, t_max,
                                    block=256, K=4, interpret=True)
    assert not np.any(np.asarray(hb3.tri)[dead] >= 0)
    live = ~dead
    np.testing.assert_array_equal(np.asarray(hu.tri)[live],
                                  np.asarray(hb3.tri)[live])
