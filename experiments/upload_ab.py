"""Host->device upload batching over the tunnel: per-array jnp.asarray
vs one jax.device_put of the tuple, measured around a real dispatch
(the readback twin of readback_ab.py)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N = 40

@jax.jit
def f(a, b, c, d, e):
    return a.sum() + b.sum() + c.sum() + d.sum() + e.sum()

host = [np.ones((8, 522), np.int32), np.ones((8,), np.int32),
        np.ones((8,), np.float32), np.ones((8, 2), np.uint32),
        np.ones((8,), np.bool_)]
_ = np.asarray(f(*[jnp.asarray(h) for h in host]))  # warm

t0 = time.time()
for _ in range(N):
    outs = f(*[jnp.asarray(h) for h in host])
    _ = np.asarray(outs)
print(f"5x jnp.asarray + dispatch : {(time.time()-t0)/N*1e3:7.1f} ms/iter",
      flush=True)

t0 = time.time()
for _ in range(N):
    dev = jax.device_put(tuple(host))
    outs = f(*dev)
    _ = np.asarray(outs)
print(f"device_put(tuple) + disp  : {(time.time()-t0)/N*1e3:7.1f} ms/iter",
      flush=True)

t0 = time.time()
for _ in range(N):
    outs = f(*[jnp.asarray(h) for h in host[:1]],
             *[jnp.asarray(h) for h in host[1:]])
    _ = np.asarray(outs)
print(f"same, interleaved         : {(time.time()-t0)/N*1e3:7.1f} ms/iter",
      flush=True)

# pure-dispatch floor: device-resident operands
dev = jax.device_put(tuple(host))
t0 = time.time()
for _ in range(N):
    outs = f(*dev)
    _ = np.asarray(outs)
print(f"device-resident + dispatch: {(time.time()-t0)/N*1e3:7.1f} ms/iter",
      flush=True)
