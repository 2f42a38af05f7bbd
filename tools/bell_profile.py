"""Profile bell-path compile/exec time on the real chip (diagnostic tool)."""
import time

import numpy as np
from scipy import sparse as sp

t_import0 = time.perf_counter()
import scs_tpu
from scs_tpu.api import SCS
print(f"import: {time.perf_counter() - t_import0:.1f}s")

rng = np.random.RandomState(7)
m, n, density = 600, 400, 0.01
A = sp.random(m, n, density=density, random_state=rng, format="csc")
A = A + sp.eye(m, n, format="csc")
x0 = rng.randn(n)
s = np.abs(rng.randn(m))
b = A @ x0 + s
y = np.abs(rng.randn(m))
c = -(A.T @ y)
data = {"A": sp.csc_matrix(A), "b": b, "c": c}

t0 = time.perf_counter()
solver = SCS(
    data, {"l": m}, solver_strategy="bell", bell_block_size=128,
    eps_abs=1e-6, eps_rel=1e-6, verbose=False, dtype="float32",
)
print(f"SCS() setup (incl _jit_init compile+run): {time.perf_counter() - t0:.1f}s")

core, mats = solver.core, solver.mats
state = solver._state0

t0 = time.perf_counter()
st1 = core._jit_chunk(state, mats)
import jax
jax.block_until_ready(st1.u)
print(f"first _jit_chunk (compile+run): {time.perf_counter() - t0:.1f}s")

t0 = time.perf_counter()
st2 = core._jit_chunk(st1, mats)
jax.block_until_ready(st2.u)
print(f"second _jit_chunk (cached): {time.perf_counter() - t0:.3f}s")

t0 = time.perf_counter()
sol = solver.solve(warm_start=False)
print(f"full solve: {time.perf_counter() - t0:.1f}s, status={sol['info']['status']}, iters={sol['info']['iter']}")
