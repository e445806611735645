"""Characterize axon-tunnel transfer behavior: are host-created jnp arrays
re-uploaded on every execution? How fast is H2D / D2H?"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


MB = 1 << 20
for size_mb in (1, 4, 16):
    xnp = np.random.default_rng(0).normal(size=(size_mb * MB // 4,)).astype(np.float32)
    f = jax.jit(lambda x: x + 1)

    # host-created via jnp.asarray
    xh = jnp.asarray(xnp)
    t_h = timeit(f, xh, n=5)

    # explicitly device_put
    xd = jax.device_put(xnp, jax.devices()[0])
    jax.block_until_ready(xd)
    t_d = timeit(f, xd, n=5)

    # device-produced
    xp = jax.block_until_ready(f(xd))
    t_p = timeit(f, xp, n=5)

    # H2D cost itself
    t0 = time.perf_counter()
    for _ in range(3):
        y = jax.device_put(xnp, jax.devices()[0])
        jax.block_until_ready(y)
    t_put = (time.perf_counter() - t0) / 3 * 1000

    print(f"{size_mb:3d}MB  f(jnp.asarray): {t_h:9.3f} ms   f(device_put): "
          f"{t_d:9.3f} ms   f(device-made): {t_p:9.3f} ms   device_put: "
          f"{t_put:9.3f} ms")

# D2H for small sizes (the per-frame readbacks we actually do)
for nbytes, shape in ((4, ()), (4096, (1024,)), (1 << 20, (262144,))):
    xd = jax.block_until_ready(jax.device_put(np.zeros(shape, np.float32)))
    f = jax.jit(lambda x: x + 1)
    y = jax.block_until_ready(f(xd))
    t0 = time.perf_counter()
    for _ in range(5):
        _ = np.asarray(y)
    t = (time.perf_counter() - t0) / 5 * 1000
    print(f"D2H {nbytes/1024:.1f}KB: {t:8.3f} ms")
