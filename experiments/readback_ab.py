"""How do small device->host readbacks batch over the axon tunnel?
np.asarray per array vs jax.device_get of a tuple vs one packed array.
Decides the fix for the 17.8% top-N logprobs overhead (engine dispatches
read 5 small arrays instead of 3)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

N = 40

@jax.jit
def make(x):
    return (x + 1, x * 2.0, x - 3,
            jnp.zeros((16, 8, 5), jnp.float32) + x[0, 0],
            jnp.zeros((16, 8, 5), jnp.int32) + x[0, 0].astype(jnp.int32))

x = jnp.ones((16, 8), jnp.float32)
outs = make(x)
_ = [np.asarray(o) for o in outs]  # warm

t0 = time.time()
for _ in range(N):
    outs = make(x)
    _ = [np.asarray(o) for o in outs]
print(f"5x np.asarray     : {(time.time()-t0)/N*1e3:7.1f} ms/iter", flush=True)

t0 = time.time()
for _ in range(N):
    outs = make(x)
    _ = jax.device_get(outs)
print(f"device_get(tuple) : {(time.time()-t0)/N*1e3:7.1f} ms/iter", flush=True)

t0 = time.time()
for _ in range(N):
    outs = make(x)
    _ = [np.asarray(o) for o in outs[:3]]
print(f"3x np.asarray     : {(time.time()-t0)/N*1e3:7.1f} ms/iter", flush=True)

t0 = time.time()
for _ in range(N):
    outs = make(x)
    _ = np.asarray(outs[0])
print(f"1x np.asarray     : {(time.time()-t0)/N*1e3:7.1f} ms/iter", flush=True)
