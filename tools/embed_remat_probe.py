"""Measure VERDICT r2 weak-#2's untried lever: rematerialize ONLY the
positional embedding in backward (jax.checkpoint around encoding.embed)
on the flagship step, vs baseline. No product code changes."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from plnerf.core import encoding
from plnerf.core.config import ModelConfig, RenderConfig
from plnerf.train import step as train_step

N_RAND, INNER, ROUNDS, STEPS = 8192, 10, 3, 5

def make_rays(n):
    k1, k2 = jax.random.split(jax.random.key(1))
    d = jax.random.normal(k1, (n, 3)); d /= jnp.linalg.norm(d, -1, keepdims=True)
    return jnp.concatenate([jax.random.normal(k2, (n,3))*0.1, d,
                            jnp.full((n,1),2.0), jnp.full((n,1),6.0), d], -1)

def bench(label):
    mcfg = ModelConfig()
    rcfg = RenderConfig(n_samples=128, n_importance=64, mode="linear",
                        color_mode="midpoint", white_bkgd=True, perturb=True,
                        mlp_dtype="bfloat16")
    setup = train_step.TrainSetup(mcfg=mcfg, rcfg=rcfg, accum_chunks=2)
    state = train_step.init_state(jax.random.key(0), setup)
    rays = make_rays(N_RAND)
    batch = {"rays": jnp.broadcast_to(rays, (INNER,)+rays.shape),
             "target": jnp.full((INNER, N_RAND, 3), 0.5)}
    stepf = train_step.make_multi_train_step(setup, INNER)
    key = jax.random.key(2)
    for _ in range(2):
        state, m = stepf(state, batch, key)
        float(m["loss"])          # absorb compile + post-compile stall
    best = None
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        for i in range(STEPS):
            key = jax.random.fold_in(key, r*STEPS+i)
            state, m = stepf(state, batch, key)
        float(m["loss"])
        dt = (time.perf_counter()-t0) / (STEPS*INNER)
        print(f"[{label}] round {r}: {dt*1e3:.2f} ms/step "
              f"({N_RAND/dt:,.0f} rays/s)", flush=True)
        if dt > 0.02:  # FLOP-floor sanity
            best = dt if best is None else min(best, dt)
    return best

base = bench("baseline")

orig = encoding.embed
encoding.embed = functools.partial(
    jax.checkpoint, static_argnums=(1, 2))(orig)
remat = bench("embed-remat")
print(f"RESULT baseline {base*1e3:.2f} ms/step vs embed-remat "
      f"{remat*1e3:.2f} ms/step ({(base-remat)/base*100:+.1f}% change)",
      flush=True)
