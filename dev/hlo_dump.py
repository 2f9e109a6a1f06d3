"""Dump the compiled HLO of a standalone adaptive solve and count the
while-body's state-wide ops (probe 6 follow-up).

Run on the TPU: python dev/hlo_dump.py
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "bfloat16")

import torchdiffeq_tpu as tde

B = 4096
y0 = jax.random.normal(jax.random.PRNGKey(4), (B, 658), jnp.float32) * .1
Wb = jax.random.normal(jax.random.PRNGKey(5), (658, 658), jnp.float32) * .01
field = lambda t, y: jnp.tanh(y) @ Wb
t_rev = jnp.stack([jnp.float32(1.0), jnp.float32(0.0)])


@jax.jit
def solve(y0):
    return tde.odeint(field, y0, t_rev, rtol=1e-3, atol=1e-5,
                      options=dict(step_to_end=True))


txt = solve.lower(y0).compile().as_text()
with open('/tmp/solve_hlo.txt', 'w') as f:
    f.write(txt)
print("total HLO lines:", txt.count('\n'))

# big-tensor ops: anything producing a >=1M-element f32 tensor
pat = re.compile(r'f32\[(\d+),(\d+)(?:,(\d+))?\]')
counts = {}
for line in txt.splitlines():
    m = pat.search(line)
    if not m:
        continue
    dims = [int(g) for g in m.groups() if g]
    n = 1
    for d in dims:
        n *= d
    if n < 1_000_000:
        continue
    op = line.strip().split(' = ')[0].strip()
    kind = re.sub(r'[.\d]+$', '', op.split(' ')[-1]) or op
    opname = line.split('=')[1].strip().split('(')[0].split(' ')[-1] \
        if '=' in line else '?'
    opname = re.sub(r'[.\d]+$', '', opname)
    counts[opname] = counts.get(opname, 0) + 1

for k, v in sorted(counts.items(), key=lambda kv: -kv[1]):
    print(f"{k:30s} {v}")
