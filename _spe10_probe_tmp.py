import time
import jax, jax.numpy as jnp, numpy as np
from parelagmc_tpu.config import ProblemConfig
from parelagmc_tpu.physics.spe10 import load_spe10_kinv
from parelagmc_tpu.problems import build_problem

t0=time.perf_counter()
cfg = ProblemConfig(mesh="spe10", refinements=1, batch_size=8, correlation_length=100.0)
cfg.darcy_solver.relative_tolerance = 1e-3
cfg.darcy_solver.restart_every = 40
cfg.darcy_solver.max_iterations = 250
kinv = load_spe10_kinv(None, ncells=(60,220,85))
prob = build_problem(cfg, kinv_ref=kinv)
print("setup: %.1fs" % (time.perf_counter()-t0), flush=True)

B = cfg.batch_size
sampler, solver = prob.sampler, prob.solver
def pair(key):
    xi = sampler.sample(0, key, B)
    s_f = sampler.eval(0, xi)
    s_c = sampler.eval(1, xi, xi_level=0)
    qc,_,ic = solver.solve_fwd(1, s_c)
    q,_,if_ = solver.solve_fwd(0, s_f)
    return q, q-qc, if_.iterations, ic.iterations
from parelagmc_tpu.ops.jit_utils import jit_hoisted
step = jit_hoisted(pair, jax.random.PRNGKey(0))
key = jax.random.PRNGKey(0)
t0=time.perf_counter(); out = jax.block_until_ready(step(key)); print("compile+first: %.1fs" % (time.perf_counter()-t0), flush=True)
t0=time.perf_counter()
for i in range(3): out = step(jax.random.fold_in(key,i))
jax.block_until_ready(out)
dt=(time.perf_counter()-t0)/3
q,y,itf,itc = out
print("SPE10 fine pair: %.2f s/batch(%d) -> %.2f samples/s ; iters f=%d c=%d" % (dt, B, B/dt, int(itf), int(itc)), flush=True)
print("Q:", np.asarray(q)[:4], "Y:", np.asarray(y)[:4])
# sampler-only throughput (the reference's SPE10 performance harness metric)
f = jit_hoisted(lambda k: sampler.eval(0, sampler.sample(0,k,B)), jax.random.PRNGKey(0))
jax.block_until_ready(f(key))
t0=time.perf_counter()
for i in range(5): o=f(jax.random.fold_in(key,i))
jax.block_until_ready(o)
dt=(time.perf_counter()-t0)/5
print("SPE10 sampler-only L0: %.3f s/batch -> %.1f samples/s" % (dt, B/dt))
