import time
import jax, jax.numpy as jnp, numpy as np
from nenbody_tpu.config import VisionConfig
from nenbody_tpu.ops import wireframe as wf
from nenbody_tpu.vision import render
from nenbody_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache()

def slope(fn, carry, sync, steps, m=8):
    _ = np.asarray(sync(fn(carry)))
    c = jax.block_until_ready(jax.tree.map(lambda x: x + jnp.asarray(1e-6, x.dtype), carry))
    t0 = time.perf_counter(); _ = np.asarray(sync(fn(c))); t1 = time.perf_counter() - t0
    c = jax.block_until_ready(jax.tree.map(lambda x: x + jnp.asarray(2e-6, x.dtype), carry))
    t0 = time.perf_counter()
    for _ in range(m): c = fn(c)
    _ = np.asarray(sync(c)); tm = time.perf_counter() - t0
    return max((tm - t1) / ((m - 1) * steps), 1e-12)

n, w, k = 100, 1024, 400
kp, kv = jax.random.split(jax.random.key(7))
p = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
v = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
tex = render.checker_texture(8, 2)

def roll(vcfg, kk, texture=None):
    @jax.jit
    def f(c):
        pp, vv = c
        def body(pp, _):
            s = wf.render_rows_wireframe_tiled(pp, vv, vcfg, texture=texture)[0]
            return pp + 1e-7 * s[:, :2], ()
        pp, _ = jax.lax.scan(body, pp, None, length=kk)
        return pp, vv
    return f

for label, aa, texture in [("plain", False, None), ("aa", True, None), ("aa+tex", True, tex)]:
    vcfg = VisionConfig(width=w, sprite_mode="wireframe", antialias=aa)
    want = render.render_rows(p, v, vcfg, texture=texture)
    got = wf.render_rows_wireframe_tiled(p, v, vcfg, texture=texture)
    derr = float(jnp.max(jnp.abs(got[1] - want[1])))
    serr = float(jnp.max(jnp.abs(got[0] - want[0])))
    dt = slope(roll(vcfg, k, texture), (p, v), lambda c: c[0][:1], k)
    print(f"wf {label}: {dt*1e6:.1f} us/step -> {n/dt:.3g} af/s (derr {derr:.2g} serr {serr:.2g})", flush=True)

# batched envs (deployment shape): B envs x N=100 agents, W=1024 AA
B, kb = 64, 20
vcfg = VisionConfig(width=w, sprite_mode="wireframe", antialias=True)
bp = jax.random.uniform(kp, (B, n, 2), minval=-100, maxval=100, dtype=jnp.float32)
bv = jax.random.uniform(kv, (B, n, 2), minval=-1, maxval=1, dtype=jnp.float32)
@jax.jit
def broll(c):
    pp, vv = c
    def body(pp, _):
        s = jax.vmap(lambda a, b: wf.render_rows_wireframe_tiled(a, b, vcfg)[0])(pp, vv)
        return pp + 1e-7 * s[..., :2], ()
    pp, _ = jax.lax.scan(body, pp, None, length=kb)
    return pp, vv
dt = slope(broll, (bp, bv), lambda c: c[0][:1, :1], kb, m=6)
print(f"wf aa batched B={B}: {dt*1e6:.1f} us/step -> {B*n/dt:.3g} af/s", flush=True)
