"""One-process A/B of the pushforward slab kernel's KB grouping
(row-blocks per Mosaic grid step) at live Marmousi shapes.

The kernel's compute is value-independent, so random in-band inputs
time the same as live state; what matters is shape (29 shots, 85
row-blocks, Q=4, R=16, lanes=384) and the per-grid-step fixed cost
being amortized. Timing per CLAUDE.md: data-dependent chain inside one
jit, scalar fetch, min-of-N.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from devito_fwi_tpu.ops import pallas_bfm as pb

B, nblk, Q, R, lanes = 29, 85, 4, 16, 384
G, dxmax = 24, 7
rng = np.random.RandomState(0)
rel = jnp.asarray(rng.randint(0, G - 1, (B, nblk, Q, R, lanes)), jnp.int32)
dxr = jnp.asarray(rng.randint(0, 2 * dxmax, (B, nblk, Q, R, lanes)), jnp.int32)
w = [jnp.asarray(rng.rand(B, nblk, Q, R, lanes), jnp.float32) for _ in range(4)]

_fetch = jax.jit(lambda x: x.ravel()[0])

@partial(jax.jit, static_argnames=("kb",))
def chain(r, d, w0, w1, w2, w3, kb):
    # big operands as ARGUMENTS: closure captures lower as program
    # constants and blow the remote-compile request (CLAUDE.md)
    def body(c, _):
        s = pb.pushforward_slabs(c, d, w0, w1, w2, w3,
                                 G=G, dxmax=dxmax, R=R, KB=kb)
        # data-dependent feedback, keep rel in range
        c = jnp.minimum(c + (s[:, :, None, :R].astype(jnp.int32) & 0),
                        G - 2)
        return c, None
    c, _ = jax.lax.scan(body, r, None, length=10)
    return jnp.sum(c)


for KB in (1, 2, 4, 8):
    t0 = time.perf_counter()
    float(_fetch(chain(rel, dxr, w[0], w[1], w[2], w[3], kb=KB)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(_fetch(chain(rel, dxr, w[0], w[1], w[2], w[3], kb=KB)))
        ts.append(time.perf_counter() - t0)
    print(f"KB={KB}: {min(ts)/10*1e3:.2f} ms/call  (compile {comp:.1f}s)")
