import time, numpy as np, jax, jax.numpy as jnp
from annealing_sign_problem_tpu import systems, scale
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config

config = systems.get_system("heisenberg_pyrochlore_2x2x2")
basis = basis_from_config(config)
op = operator_from_config(config, basis)
scale.build_basis_at_scale(basis, cache_path="physical_systems/data-small/heisenberg_pyrochlore_2x2x2_basis.npz")
K = basis.number_states
print("K =", K, flush=True)

states_dev = basis.states_device
norms_dev = jnp.asarray(np.sqrt(basis.norms), dtype=jnp.float32)
chunk_size = 1024

@jax.jit
def one_chunk(chunk_states, chunk_norm, x):
    nbrs, coeffs = op.apply_padded(chunk_states)
    idx = jnp.clip(jnp.searchsorted(states_dev, nbrs), 0, K - 1)
    member = states_dev[idx] == nbrs
    factor = jnp.where(member, norms_dev[idx], 0.0) / chunk_norm[:, None]
    return jnp.sum(coeffs.astype(jnp.float32) * factor * x[idx], axis=1)

x = jnp.asarray(np.random.RandomState(0).rand(K).astype(np.float32))
cs = states_dev[:chunk_size]
cn = norms_dev[:chunk_size]
t0 = time.time(); r = one_chunk(cs, cn, x); r.block_until_ready()
print(f"one chunk compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10):
    r = one_chunk(cs, cn, x)
r.block_until_ready()
dt = (time.time() - t0) / 10
print(f"one chunk steady: {dt*1e3:.1f} ms -> full matvec ~ {dt*(K/chunk_size):.1f}s", flush=True)

# larger chunk
chunk_size2 = 8192
@jax.jit
def one_chunk2(chunk_states, chunk_norm, x):
    nbrs, coeffs = op.apply_padded(chunk_states)
    idx = jnp.clip(jnp.searchsorted(states_dev, nbrs), 0, K - 1)
    member = states_dev[idx] == nbrs
    factor = jnp.where(member, norms_dev[idx], 0.0) / chunk_norm[:, None]
    return jnp.sum(coeffs.astype(jnp.float32) * factor * x[idx], axis=1)
cs2 = jnp.tile(states_dev[:chunk_size2], 1)
cn2 = norms_dev[:chunk_size2]
t0 = time.time(); r = one_chunk2(cs2, cn2, x); r.block_until_ready()
print(f"8k chunk compile+run: {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
for _ in range(10):
    r = one_chunk2(cs2, cn2, x)
r.block_until_ready()
dt = (time.time() - t0) / 10
print(f"8k chunk steady: {dt*1e3:.1f} ms -> full matvec ~ {dt*(K/chunk_size2):.1f}s", flush=True)
