import sys, time
sys.path.insert(0, "examples")
import jax, jax.numpy as jnp
from jax import lax
from pyclaw_tpu.riemann import euler_4wave_2D
rp = euler_4wave_2D.rp
params = {"gamma": 1.4}
key = jax.random.PRNGKey(0)

def timeit(n1, n2):
    q = jax.random.uniform(key, (4, n1, n2), jnp.float32, 1.0, 2.0)
    q = q.at[3].set(10.0 + q[3])
    @jax.jit
    def run_n(q0, n):
        def body(i, qc):
            w, s, am, ap = rp(0, qc[:, :-1, :], qc[:, 1:, :], None, None, params)
            out = am + ap
            return qc - 1e-9*jnp.pad(out, ((0,0),(0,1),(0,0)))
        return lax.fori_loop(0, n, body, q0)
    def timed(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_n(q, n); float(jnp.sum(out[0, ::256, ::256]))
            best = min(best, time.perf_counter()-t0)
        return best
    timed(3); t1 = timed(5); t2 = timed(55)
    return round((t2-t1)/50*1e3, 3)

for shape in ((1024,1024),(1028,1028),(1032,1032),(1028,1024),(1024,1028),(1032,1024),(1024,1032),(1028,1152),(1032,1152)):
    print(shape, timeit(*shape), 'ms')
