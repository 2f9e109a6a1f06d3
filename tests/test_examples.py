"""Example smoke tests: every reference example port runs end-to-end (tiny
configs) and meets its learning/accuracy assertion."""
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
EXAMPLES = os.path.join(REPO, 'examples')

CONFIGS = {
    'ode_demo.py': ['--niters', '20', '--test_freq', '20',
                    '--data_size', '120'],
    'cnf.py': ['--niters', '25'],
    'latent_ode.py': ['--niters', '12', '--nspiral', '8'],
    'odenet_mnist.py': ['--nepochs', '1', '--steps_per_epoch', '12',
                        '--hidden', '8', '--batch_size', '32'],
    'bouncing_ball.py': [],
    'learn_physics.py': ['--niters', '120'],
    'parareal_demo.py': ['--slices', '8', '--iters', '4', '--mesh'],
    'ensemble.py': ['--batch', '64'],
}


@pytest.mark.parametrize('script', sorted(CONFIGS))
def test_example_runs(script):
    env = dict(os.environ)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    code = (
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_enable_x64', True); "
        "import sys, runpy; sys.argv = [%r] + %r; "
        "runpy.run_path(%r, run_name='__main__')"
        % (script, CONFIGS[script], os.path.join(EXAMPLES, script)))
    proc = subprocess.run([sys.executable, '-c', code], env=env,
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
