"""Microbench: per-row KV cache write strategies at serving shapes.

Cache [L=28, B=32, S=864, KVH=2, Dh=128] int8 (the bskd serving layout with
layers stacked); each decode step writes one [KVH, Dh] block per row at that
row's own index. Strategies:
  a) masked-select rewrite of the full slice (shipped r5: 5.32 ms/16-step chunk)
  b) XLA scatter via .at[arange(B) rows, per-row column].set
  c) one-hot matmul-free select restricted per layer (same as a, layer loop)
16 chained steps, 3 iters.
"""
import sys, time
import jax, jax.numpy as jnp, numpy as np

L, B, S, KVH, Dh = 28, 32, 864, 2, 128
rng = np.random.default_rng(0)
idx0 = jnp.asarray(rng.integers(300, 800, size=(B,)), jnp.int32)

def new_kv(step):
    return jnp.asarray(rng.integers(-127, 127, size=(L, B, KVH, Dh)), jnp.int8)

NK = [new_kv(t) for t in range(16)]

@jax.jit
def masked(cache, idx, nk):
    # (a) full-slice masked select: positions == idx[b] take the new value
    pos = jnp.arange(S)[None, None, :, None, None]           # [1,1,S,1,1]
    sel = pos == idx[None, :, None, None, None].astype(jnp.int32)
    return jnp.where(sel, nk[:, :, None], cache), idx + 1

@jax.jit
def scattered(cache, idx, nk):
    # (b) scatter: one [KVH,Dh] block per (layer, row)
    lays = jnp.repeat(jnp.arange(L), B)
    rows = jnp.tile(jnp.arange(B), L)
    cols = jnp.tile(idx, L)
    upd = nk.reshape(L * B, KVH, Dh)
    return cache.at[lays, rows, cols].set(upd), idx + 1

def chain(fn):
    def run(cache, idx):
        for t in range(16):
            cache, idx = fn(cache, idx, NK[t])
        return cache, idx
    return jax.jit(run)

for name, fn in [("masked", masked), ("scatter", scattered)]:
    cache = jnp.zeros((L, B, S, KVH, Dh), jnp.int8)
    idx = idx0
    step16 = chain(fn)
    cache, idx = step16(cache, idx)  # compile
    jax.block_until_ready(cache)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        cache, idx = step16(cache, idx % (S - 20))
        jax.block_until_ready(cache)
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"{name}: {ms:.2f} ms / 16-step chunk = {ms/16*1000:.0f} us/step")
