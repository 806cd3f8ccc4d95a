#!/usr/bin/env python
"""Round-5 experiment: which live-ray ordering best restores packet
coherence for BOUNCE rays?

The round-4 A/B showed the shared-stack kernel collapses 6.8x on
shuffled rays (BASELINE.md r4) — an incoherent tile's node union is
nearly the whole tree.  The Morton position sort (sort_key='pos') is on
by default, but bounce rays still dominate the frame.  This experiment
builds REALISTIC bounce-1 continuation rays (cosine-hemisphere samples
from the actual primary hit points of the flagship scene) and times the
resident wide kernel under candidate orderings:

  orig      pixel order (what a no-sort frame sees)
  shuf      random (worst case)
  morton    Morton(origin cell), 4 bits/axis — current 'pos' key minus oct
  pos_oct   Morton(origin) * 8 + normal octant — the production 'pos' key
  dir_oct   direction octant MAJOR, then Morton(origin) — 'dir'-style key
  tree_c    treelet containing the ray origin (BVH top-cut), + dir octant
  tree_e    nearest treelet by ray AABB entry-t (uses the actual
            direction — only available to a pre-traversal sort)
  tree_e8   tree_e with 8 treelets only

Treelets are maximal subtrees from a node-count top-down cut (same
machinery as accel/bricks.py but by node budget).  Fetch-bounded timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.traverse_pallas import closest_hit_pallas
from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def subtree_cut(bvh, max_nodes: int):
    """Top-down cut: roots of maximal subtrees with <= max_nodes nodes.
    Returns (roots, lo [K,3], hi [K,3])."""
    right = np.asarray(bvh.right_child, np.int64)
    node_min = np.asarray(bvh.node_min, np.float32)
    node_max = np.asarray(bvh.node_max, np.float32)
    n = len(right)
    id_end = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        id_end[i] = i + 1 if right[i] < 0 else id_end[right[i]]
    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        if id_end[i] - i <= max_nodes or right[i] < 0:
            roots.append(i)
            continue
        stack.append(int(right[i]))
        stack.append(i + 1)
    roots = np.array(sorted(roots))
    return roots, node_min[roots], node_max[roots]


def entry_t(lo, hi, o, d, chunk=8192):
    """[R, K] slab entry t (inf if miss).  numpy, host-side, chunked
    over rays (the full [R, K, 3] intermediate is tens of GB)."""
    lo = lo.astype(np.float32)
    hi = hi.astype(np.float32)
    o = o.astype(np.float32)
    d = d.astype(np.float32)
    inv = np.where(np.abs(d) < 1e-20, 1e20, 1.0 / d).astype(np.float32)
    out = np.empty((len(o), len(lo)), np.float32)
    for s in range(0, len(o), chunk):
        e = min(s + chunk, len(o))
        f = (hi[None, :, :] - o[s:e, None, :]) * inv[s:e, None, :]
        n_ = (lo[None, :, :] - o[s:e, None, :]) * inv[s:e, None, :]
        t_near = np.maximum(np.minimum(f, n_), 0).max(axis=2)
        t_far = np.maximum(f, n_).min(axis=2)
        out[s:e] = np.where(t_far >= t_near, t_near, np.inf)
    return out


def morton(o, lo, inv_ext, bits=4):
    q = [np.clip(((o[:, i] - lo[i]) * inv_ext[i] * (1 << bits)).astype(
        np.uint32), 0, (1 << bits) - 1) for i in range(3)]
    m = np.zeros(len(o), np.uint32)
    for bit in range(bits - 1, -1, -1):
        for ax in range(3):
            m = m * 2 + ((q[ax] >> bit) & 1)
    return m


def octant(d):
    return ((d[:, 0] > 0).astype(np.uint32) * 4
            + (d[:, 1] > 0) * 2 + (d[:, 2] > 0))


def main():
    log("devices:", jax.devices())
    scene, cam_state = config3_teapot_night(env_height=32)
    trav = scene.trav
    cam_state.aspect = 1.0
    o, d, _ = camera_rays(cam_state.basis(), 512, 512)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)

    # ---- build realistic bounce-1 rays ---------------------------------
    hit = closest_hit_pallas(trav, o, d, t_max)
    tri = np.asarray(hit.tri)
    t = np.asarray(hit.t)
    on, dn = np.asarray(o), np.asarray(d)
    pos = on + dn * t[:, None]
    # geometric normal from the mesh
    mesh = scene.mesh
    idx = np.asarray(mesh.indices)[np.maximum(tri, 0)]
    p = np.asarray(mesh.positions)[idx]  # [R, 3, 3]
    gn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    gn /= np.maximum(np.linalg.norm(gn, axis=1, keepdims=True), 1e-12)
    gn = np.where((gn * dn).sum(1, keepdims=True) > 0, -gn, gn)
    # cosine-hemisphere sample around the normal
    rng = np.random.default_rng(1)
    u1, u2 = rng.random(r), rng.random(r)
    rad = np.sqrt(u1)
    phi = 2 * np.pi * u2
    x, y = rad * np.cos(phi), rad * np.sin(phi)
    z = np.sqrt(np.maximum(1 - u1, 0))
    up = np.where(np.abs(gn[:, 2:3]) < 0.99, [0, 0, 1.0], [1.0, 0, 0])
    tx = np.cross(up, gn)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    ty = np.cross(gn, tx)
    bd = tx * x[:, None] + ty * y[:, None] + gn * z[:, None]
    bo = pos + gn * 1e-4
    live = tri >= 0
    # dead rays masked: park them harmlessly (kernel masks them anyway)
    log(f"live bounce rays: {live.sum()}/{r}")

    root = np.asarray(trav.nodes8[0])
    lo_b, hi_b = root[0:3], root[3:6]
    inv_ext = 1.0 / np.maximum(hi_b - lo_b, 1e-6)

    # ---- orderings ------------------------------------------------------
    orders = {}
    orders["orig"] = np.arange(r)

    m = morton(bo, lo_b, inv_ext)
    oct_d = octant(bd)
    oct_n = octant(gn)
    orders["pos_oct"] = np.argsort(m * 8 + oct_n, kind="stable")
    orders["dir_oct"] = np.argsort(oct_d * (1 << 14) + m, kind="stable")

    n_nodes = len(np.asarray(scene.bvh.right_child))
    for k_target, minor, name in (
        (256, "oct", "tree_e256"),
        (512, "oct", "tree_e512"),
        (1024, "oct", "tree_e1k"),
        (1024, "morton", "tree_e1km"),
        (1024, "none", "tree_e1k-"),
    ):
        roots, tlo, thi = subtree_cut(scene.bvh, max(n_nodes // k_target, 1))
        te = entry_t(tlo, thi, bo, bd)
        nearest = np.where(np.isfinite(te).any(1), te.argmin(1),
                           len(roots)).astype(np.uint64)
        if minor == "oct":
            key = nearest * 8 + oct_d
        elif minor == "morton":
            key = nearest * (1 << 12) + m
        else:
            key = nearest
        orders[name] = np.argsort(key, kind="stable")
        log(f"{name}: {len(roots)} treelets")

    # live-first within every ordering (mirrors sort_live_first)
    for k in orders:
        p_ = orders[k]
        p_ = np.concatenate([p_[live[p_]], p_[~live[p_]]])
        orders[k] = p_

    # ---- time the kernel under each ordering ---------------------------
    f = jax.jit(lambda o_, d_, m_: closest_hit_pallas(
        trav, o_, d_, t_max, m_, tile_size=4096, with_stats=True))
    base_sum = None
    for name, p_ in orders.items():
        oo = jnp.asarray(bo[p_])
        dd = jnp.asarray(bd[p_])
        mm = jnp.asarray(live[p_])
        hit2, iters = f(oo, dd, mm)
        tot = int(iters.sum())
        chk = float(jnp.where(jnp.asarray(live[p_]), hit2.t, 0.0).sum())
        if base_sum is None:
            base_sum = chk
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out, _ = f(oo, dd, mm)
        float(out.t.sum())
        dt = (time.perf_counter() - t0) / n
        ok = "ok" if abs(chk - base_sum) < 1e-2 * max(abs(base_sum), 1) else (
            f"CHECKSUM {chk} vs {base_sum}")
        log(f"{name:10s}: {dt*1e3:7.2f} ms  {tot:8d} iters  "
            f"{r/dt/1e6:7.1f} M rays/s  {ok}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
