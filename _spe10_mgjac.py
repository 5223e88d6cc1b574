import time
import jax, jax.numpy as jnp, numpy as np
from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.physics.spe10 import load_spe10_kinv
from parelagmc_tpu.problems import build_problem
from parelagmc_tpu.ops.jit_utils import jit_hoisted

cfg = ProblemConfig(mesh="spe10", refinements=1, batch_size=4, correlation_length=100.0)
cfg.darcy_solver.relative_tolerance = 1e-3
cfg.darcy_solver.max_iterations = 100
cfg.darcy_solver.restart_every = 0
cfg.darcy_solver.mg_coarse_sweeps = 8
kinv = load_spe10_kinv(None, ncells=(60,220,85))
t0=time.perf_counter()
prob = build_problem(cfg, kinv_ref=kinv)
print("setup %.0fs" % (time.perf_counter()-t0), flush=True)
B=4
key = jax.random.PRNGKey(0)
def pair(key):
    xi = prob.sampler.sample(0, key, B)
    s = prob.sampler.eval(0, xi)
    q,_,info = prob.solver.solve_fwd(0, s)
    return jnp.sum(q), info.iterations, jnp.max(info.residual)
step = jit_hoisted(pair, key)
t0=time.perf_counter()
qs, it, res = step(key)
print("compile+first: %.0fs  q=%.4g iters=%d res=%.2e" % (time.perf_counter()-t0, float(qs), int(it), float(res)), flush=True)
ts=[]
for i in range(2):
    k = jax.random.fold_in(key, i)
    t0=time.perf_counter(); v=float(step(k)[0]); ts.append(time.perf_counter()-t0)
print("steady: %.2f s/batch -> %.2f samples/s" % (min(ts), B/min(ts)), flush=True)
