import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
from orb_slam2v2_1_tpu.ops import fast as fast_ops, image as image_ops, orb

rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0, 255, (480, 640)), jnp.float32)
cfg = orb.OrbConfig()

def timeit(f, *a, n=30):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n*1e3

pyr = jax.jit(lambda x: image_ops.build_pyramid(x, cfg.n_levels, cfg.scale))
print("pyramid:", timeit(pyr, img))
pimgs = pyr(img)
counts = fast_ops.level_feature_counts(cfg.n_features, cfg.n_levels, cfg.scale)

t_score = t_sel = t_blur = t_gather = t_desc = 0.0
for limg, n_l in zip(pimgs, counts):
    if n_l == 0: continue
    t_score += timeit(fast_ops.suppressed_score, limg)
    score = fast_ops.suppressed_score(limg)
    sel = jax.jit(lambda s, n=n_l: fast_ops.select_keypoints(s, n, suppress=False))
    t_sel += timeit(sel, score)
    blur = jax.jit(lambda x: image_ops.gaussian_blur(x, 9, 3.0))
    t_blur += timeit(blur, limg)
    b = blur(limg)
    yx, resp, valid = sel(score)
    g = jax.jit(orb._gather_patches)
    t_gather += timeit(g, b, yx)
    patches = g(b, yx)
    de = jax.jit(lambda p: orb.brief_descriptors(p, orb.ic_angle(p)))
    t_desc += timeit(de, patches)

print(f"score(all levels): {t_score:.2f} sel: {t_sel:.2f} blur: {t_blur:.2f} gather: {t_gather:.2f} desc: {t_desc:.2f}")
