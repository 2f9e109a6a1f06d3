"""Which side is wrong on the gl4 D5/E1/E3 parity misses?

Compare ours-gl4 and reference-gl4 at step_size=0.1 against a dopri5
@1e-12 ground truth.  Run on CPU: python dev/check_gl4.py
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, 'tests/DETEST')
sys.path.insert(0, '.')
import detest
import torchdiffeq_tpu as tde

sys.path.insert(0, '/root/reference')
import torch
from torchdiffeq import odeint as torch_odeint
torch.set_default_dtype(torch.float64)

for name in ['D5', 'E1', 'E3']:
    diffeq, init, _ = detest.ALL_PROBLEMS[name]()
    t0, y0 = init()
    y0 = y0.astype(jnp.float64)
    t = jnp.stack([t0.astype(jnp.float64), jnp.asarray(20.0, jnp.float64)])

    truth = tde.odeint(diffeq, y0, t, rtol=1e-12, atol=1e-12)[1]
    ours, st = tde.odeint_with_stats(diffeq, y0, t, rtol=1e-7, atol=1e-7,
                                     method='gl4',
                                     options=dict(step_size=0.1))

    def f_ref(tt, yy):
        return torch.as_tensor(np.asarray(
            diffeq(jnp.asarray(float(tt)), jnp.asarray(yy.detach().numpy()))))

    yt = torch_odeint(f_ref, torch.as_tensor(np.asarray(y0)),
                      torch.tensor([float(t0), 20.0]), rtol=1e-7, atol=1e-7,
                      method='gl4', options=dict(step_size=0.1))[1].numpy()

    err_ours = float(np.max(np.abs(np.asarray(ours[1]) - np.asarray(truth))))
    err_ref = float(np.max(np.abs(yt - np.asarray(truth))))
    print(f"{name}: |ours-truth| {err_ours:.3e}  |ref-truth| {err_ref:.3e}  "
          f"err_code={int(st.error_code)}")
