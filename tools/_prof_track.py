"""Scan-repetition throughput profiling of the track program's pieces.

Single dispatches sit on a ~26-30 ms relay sync floor; wrap R reps in a
lax.scan to expose real compute (CLAUDE.md recipe).
"""
import time, sys
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_matmul_precision", "highest")

from orbslam2_tpu.geometry.camera import Intrinsics
from orbslam2_tpu.solvers import pose_opt

S = 1024
key = jax.random.PRNGKey(0)
k1, k2, k3 = jax.random.split(key, 3)
pw = jax.random.normal(k1, (S, 3)) * 2.0 + jnp.array([0.0, 0.0, 5.0])
K = Intrinsics(fx=jnp.float32(480.0), fy=jnp.float32(480.0),
               cx=jnp.float32(319.5), cy=jnp.float32(239.5),
               dist=jnp.zeros(5, jnp.float32), bf=jnp.float32(48.0))
Tcw = jnp.eye(4, dtype=jnp.float32)
pc = pw
u = 480.0 * pc[:, 0] / pc[:, 2] + 319.5
v = 480.0 * pc[:, 1] / pc[:, 2] + 239.5
uv = jnp.stack([u, v], -1) + jax.random.normal(k2, (S, 2)) * 1.0
ur = u - 48.0 / pc[:, 2]
mask = jnp.arange(S) < 800
obs = pose_opt.PoseObservations(
    pw=pw, uv=uv, ur=jnp.where(mask, ur, -1.0),
    inv_sigma2=jnp.ones((S,)), mask=mask)
T0 = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(0.05)

R = 100

def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / R * 1e3
    print(f"{name}: {dt:.3f} ms/rep  ({R} reps)")
    return dt

def rep_pose(rounds, iters):
    def body(c, _):
        T = c
        r = pose_opt.pose_optimize.__wrapped__(T, obs, K, rounds=rounds, iters=iters)
        return r.Tcw, r.num_inliers
    def run(T):
        return jax.lax.scan(body, T, None, length=R)
    return run

for (rd, it) in [(2, 6), (3, 6), (4, 6), (4, 10), (2, 3), (3, 3), (4, 3)]:
    timeit(f"pose_opt {rd}x{it} ({rd*it} GN iters)", rep_pose(rd, it), T0)

# single GN iteration cost (isolate the serial chain length effect)
def rep_gn(n):
    def run(T):
        def body(c, _):
            r = pose_opt.pose_optimize.__wrapped__(c, obs, K, rounds=1, iters=n)
            return r.Tcw, ()
        return jax.lax.scan(body, T, None, length=R)
    return run

for n in [1, 2, 4, 8, 16]:
    timeit(f"1 round x {n} iters", rep_gn(n), T0)
