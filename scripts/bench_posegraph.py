"""Pose-graph layer benchmark on the current device: jitted SE(3) PGO solve
(GN matvec via jvp/vjp + block-Jacobi PCG + LM) and MXU place recognition.

Synthetic loop: a circular trajectory with odometry drift + one loop edge —
the standard PGO stress shape. Prints ms/solve at two graph sizes and the
place-recognition query time against a full keyframe database.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from okvis_tpu.utils import cachedir as _cachedir
_cachedir.configure(jax, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_default_matmul_precision", "high")

from okvis_tpu.posegraph.graph import PoseGraph


def build_circle_graph(n_nodes: int, seed: int = 0) -> PoseGraph:
    rng = np.random.default_rng(seed)
    g = PoseGraph(node_capacity=n_nodes, edge_capacity=2 * n_nodes)
    radius = n_nodes / (2 * np.pi)
    for i in range(n_nodes):
        a = 2 * np.pi * i / n_nodes
        r = np.asarray([radius * np.cos(a), radius * np.sin(a), 0.0])
        r += rng.normal(0, 0.05 * i / n_nodes, 3)  # accumulated drift
        q = np.asarray([0.0, 0.0, np.sin(a / 2), np.cos(a / 2)])
        g.add_node(i, r, q, fixed=(i == 0))
    for i in range(n_nodes - 1):
        dt = np.asarray(g.get_pose(i + 1)[0]) - np.asarray(g.get_pose(i)[0])
        g.add_edge(i, i + 1, dt + rng.normal(0, 0.01, 3),
                   np.asarray([0.0, 0, 0, 1.0]), np.eye(6) * 10.0)
    # loop edge closing the circle
    g.add_edge(n_nodes - 1, 0,
               np.asarray(g.get_pose(0)[0]) - np.asarray(g.get_pose(n_nodes - 1)[0]),
               np.asarray([0.0, 0, 0, 1.0]), np.eye(6) * 10.0)
    return g


def main():
    print("device:", jax.devices()[0])
    for n in (256, 1024):
        for solver in ("pcg", "dense"):
            g = build_circle_graph(n)
            t0 = time.perf_counter()
            g.optimize(max_iterations=8, pcg_iters=60, solver=solver)
            compile_s = time.perf_counter() - t0
            reps = 10
            t0 = time.perf_counter()
            for _ in range(reps):
                g.optimize(max_iterations=8, pcg_iters=60, solver=solver)
            dt = (time.perf_counter() - t0) / reps
            extra = "8 LM iters x 60 PCG" if solver == "pcg" else "8 LM iters, Cholesky"
            print(f"PGO n={n:5d} nodes [{solver:5s}]: {dt*1e3:8.2f} ms/solve "
                  f"({extra}; first call {compile_s:.0f}s)")

    # place recognition: query descriptor set vs the whole database
    from okvis_tpu.posegraph.place_recognition import KeyframeDatabase

    rng = np.random.default_rng(0)
    db = KeyframeDatabase(frame_capacity=1024, kp_capacity=400)
    brg = np.zeros((400, 3)); lmk = np.zeros((400, 3)); val = np.ones(400, bool)
    for i in range(1024):
        db.insert(i, rng.integers(0, 256, (400, 64), dtype=np.uint8),
                  np.ones(400, bool), brg, lmk, val)
    q = rng.integers(0, 256, (400, 64), dtype=np.uint8)
    db.query(q, np.ones(400, bool), exclude_ids=set())  # compile
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = db.query(q, np.ones(400, bool), exclude_ids=set())
    dt = (time.perf_counter() - t0) / reps
    print(f"place recognition: 400-kp query vs 1024-keyframe database: "
          f"{dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
