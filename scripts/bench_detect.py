import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_default_matmul_precision", "high")
from okvis_tpu.frontend.detection import detect_keypoints
print("backend:", jax.default_backend())
H, W = 480, 752
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
imgs = jnp.stack([img, img + 1.0])

for use_pallas in (False, True):
    f = jax.jit(lambda im: detect_keypoints(im, threshold=40.0, max_keypoints=400, use_pallas=use_pallas))
    kps = f(img); jax.block_until_ready(kps)
    n = int(np.asarray(kps.mask).sum())
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        kps = f(img)
    jax.block_until_ready(kps)
    dt = (time.perf_counter() - t0) / N
    print(f"use_pallas={use_pallas}: {dt*1e3:.3f} ms/image, {n} kps")

# vmapped (2-camera multiframe) pallas path
fb = jax.jit(jax.vmap(lambda im: detect_keypoints(im, threshold=40.0, max_keypoints=400, use_pallas=True)))
kb = fb(imgs); jax.block_until_ready(kb)
t0 = time.perf_counter()
for _ in range(50):
    kb = fb(imgs)
jax.block_until_ready(kb)
print(f"vmapped pallas x2: {(time.perf_counter()-t0)/50*1e3:.3f} ms/multiframe")

# descriptor extraction (gravity-aligned), full multiframe
from okvis_tpu.frontend.brisk import detect_and_describe_batch
angles = jnp.asarray([0.1, 0.2])
fd = jax.jit(lambda ims: detect_and_describe_batch(ims, angles, threshold=40.0, max_keypoints=400))
kd = fd(imgs); jax.block_until_ready(kd)
t0 = time.perf_counter()
for _ in range(50):
    kd = fd(imgs)
jax.block_until_ready(kd)
print(f"detect+describe x2 (one program): {(time.perf_counter()-t0)/50*1e3:.3f} ms/multiframe")
