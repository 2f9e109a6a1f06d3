"""DETEST benchmark runner (reference tests/DETEST/run.py protocol):

sweep {dopri5, fixed_adams} x tol {1e-3, 1e-6, 1e-9} over the 25 problems on
t in [0, 20], against a dopri5 @ 1e-12 self-generated ground truth; report
per-problem NFE / wall-clock / RMSE plus totals and error geomean.

Additionally (north-star metric, BASELINE.md): `--parity` runs the reference
torchdiffeq side-by-side at rtol=atol=1e-7 and reports the per-problem
NFE ratio and trajectory agreement for dopri5 and dopri8.

Run on CPU in float64:  python tests/DETEST/run.py [--parity]
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.stats.mstats import gmean  # noqa: E402

import os  # noqa: E402
_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(os.path.dirname(_here)))  # repo root
import detest  # noqa: E402

import torchdiffeq_tpu as tde  # noqa: E402


def solve(name, method, tol, t1=20.0, options='auto', count_evals=False):
    """Solve one DETEST problem.  Returns (y(t1), reported_nfe, wall,
    error_code[, executed_evals]).

    count_evals=True additionally counts the vector-field evaluations that
    actually EXECUTE (via `jax.debug.callback`) — the same convention as
    the reference-side `Counter` in `run_parity`, which wraps the func and
    therefore sees every stage-residual / corrector evaluation
    (reference rk_common.py:468-483, fixed_adams.py:208-222).  For masked
    fixed-trip loops (our Adams corrector) executed > reported; for
    early-exit while_loops (Broyden/Newton stage solves) executed is the
    data-dependent true count.
    """
    diffeq, init, _ = detest.ALL_PROBLEMS[name]()
    t0, y0 = init()
    y0 = y0.astype(jnp.float64)
    t = jnp.stack([t0.astype(jnp.float64), jnp.asarray(t1, jnp.float64)])

    counter = [0]
    if count_evals:
        base = diffeq

        def _bump(_):
            counter[0] += 1

        def diffeq(tt, yy):
            jax.debug.callback(_bump, tt)
            return base(tt, yy)

    def _run(opts):
        start = time.time()
        ys, stats = tde.odeint_with_stats(diffeq, y0, t, rtol=tol, atol=tol,
                                          method=method, options=opts)
        ys = jax.block_until_ready(ys)
        jax.effects_barrier()
        wall = time.time() - start
        out = (ys[1], int(stats.nfe), wall, int(stats.error_code))
        return out + ((counter[0],) if count_evals else ())

    if options != 'auto':
        return _run(options)
    options = None
    if method in ('fixed_adams', 'explicit_adams', 'implicit_adams'):
        # fixed-grid multistep: without a step size the 2-point horizon
        # would be a single giant step (as in the reference, whose runner
        # asks for a nonexistent 'adams' method); pick h ~ tol^(1/4).
        # max_order=6: order-12 Adams is unstable at the coarser steps
        # (tiny stability region; verified bit-identical blow-up in the
        # reference implementation).
        options = dict(step_size={1e-3: 0.2, 1e-6: 0.05,
                                  1e-9: 0.0125}[tol], max_order=6)
    return _run(options)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--parity', action='store_true',
                        help='compare NFE/trajectories vs reference torchdiffeq')
    parser.add_argument('--methods', nargs='+', default=None,
                        help='sweep/parity method subset (default: sweep '
                             'dopri5+fixed_adams, parity all PARITY_SPECS)')
    parser.add_argument('--parity-only', action='store_true',
                        help='skip the accuracy sweep, run only --parity')
    args = parser.parse_args()
    sweep_methods = args.methods or ['dopri5', 'fixed_adams']

    names = list(detest.ALL_PROBLEMS)

    if args.parity and args.parity_only:
        run_parity(names, methods=args.methods)
        return

    truth = {}
    for name in names:
        truth[name], _, _, _ = solve(name, 'dopri5', 1e-12)

    for method in sweep_methods:
        for tol in [1e-3, 1e-6, 1e-9]:
            print(f'======= {method} | tol={tol:e} =======')
            nfes, times, errs = [], [], []
            for name in names:
                est, nfe, wall, err_code = solve(name, method, tol)
                error = float(jnp.sqrt(jnp.mean(
                    (truth[name] - est) ** 2)))
                errs.append(error)
                nfes.append(nfe)
                times.append(wall)
                flag = '' if err_code == 0 else f'  [err={err_code}]'
                print(f'{name}: NFE {nfe} | Time {wall:.4f} | '
                      f'Err {error:e}{flag}')
            print(f'Total NFE {np.sum(nfes)} | Total Time '
                  f'{np.sum(times):.3f} | GeomAvg Error {gmean(errs):e}')

    if args.parity:
        run_parity(names, methods=args.methods)


# method -> (our options, reference options). 'auto' = solve()'s defaults
# (adaptive methods need none). Fixed-grid tiers use the same step_size on
# both sides so the grids are identical and the comparison is step-for-step:
#   - rk4/explicit Adams: identical formulas on identical grids -> the
#     trajectory diff directly measures arithmetic agreement (~1e-12).
#   - fixed_adams (= reference AdamsBashforthMoulton): our corrector is the
#     masked lax.while form (documented deviation, COVERAGE.md) -- NFE counts
#     differ by corrector-iteration accounting, so the NFE RATIO is reported
#     but exact 1.000 is not the expectation; trajectories must still agree
#     to corrector tolerance.
#   - implicit FIRK/DIRK tier: both sides run their stage solves to a
#     ~1e-8-class residual (reference rk_common.py:425-462 hardcodes 1e-8
#     in f64; ours via options), but iteration paths differ (our Broyden
#     is the batched good-Broyden update, the reference's maintains a dense
#     Jacobian w/ torch.linalg.solve).  The apples-to-apples column is
#     `exec` — OUR executed vector-field evaluations counted with
#     jax.debug.callback, the exact analogue of the reference-side Counter
#     that sees every stage-residual eval (rk_common.py:468-483).  The
#     `reported` column is Stats.nfe (our documented convention: 1 explicit
#     eval/step for the implicit tier, pre-convergence corrector iterations
#     for fixed_adams).
#   - scipy_solver: both sides wrap scipy.integrate.solve_ivp(LSODA); the
#     reported NFE is scipy's own sol.nfev on our side vs the Counter on
#     the reference side (reference counts the same calls scipy makes).
PARITY_SPECS = [
    ('dopri5', 'auto', None),
    ('dopri8', 'auto', None),
    ('tsit5', 'auto', None),
    ('bosh3', 'auto', None),
    ('fehlberg2', 'auto', None),
    ('adaptive_heun', 'auto', None),
    ('euler', dict(step_size=0.1), dict(step_size=0.1)),
    ('midpoint', dict(step_size=0.1), dict(step_size=0.1)),
    ('heun2', dict(step_size=0.1), dict(step_size=0.1)),
    ('heun3', dict(step_size=0.1), dict(step_size=0.1)),
    ('rk4', dict(step_size=0.1), dict(step_size=0.1)),
    ('explicit_adams', dict(step_size=0.05, max_order=6),
     dict(step_size=0.05, max_order=6)),
    ('fixed_adams', dict(step_size=0.05, max_order=6),
     dict(step_size=0.05, max_order=6)),
    ('implicit_euler', dict(step_size=0.1), dict(step_size=0.1)),
    ('implicit_midpoint', dict(step_size=0.1), dict(step_size=0.1)),
    ('trapezoid', dict(step_size=0.1), dict(step_size=0.1)),
    ('radauIIA3', dict(step_size=0.1), dict(step_size=0.1)),
    ('gl4', dict(step_size=0.1), dict(step_size=0.1)),
    ('radauIIA5', dict(step_size=0.1), dict(step_size=0.1)),
    ('gl6', dict(step_size=0.1), dict(step_size=0.1)),
    ('sdirk2', dict(step_size=0.1), dict(step_size=0.1)),
    ('trbdf2', dict(step_size=0.1), dict(step_size=0.1)),
    ('scipy_solver', 'auto', None),
]


def run_parity(names, methods=None):
    """Step-count + trajectory parity vs the reference at rtol=atol=1e-7.

    Two of our eval counts are reported per problem (see PARITY_SPECS
    comment): `reported` = Stats.nfe (our documented convention) and
    `exec` = executed VF evals via jax.debug.callback (the reference's
    func-wrapping Counter convention).  The summary geomeans use `exec`
    for the reference-convention column.
    """
    sys.path.insert(0, '/root/reference')
    import torch
    from torchdiffeq import odeint as torch_odeint
    torch.set_default_dtype(torch.float64)

    summary = []
    for method, our_opts, ref_opts in PARITY_SPECS:
        if methods is not None and method not in methods:
            continue
        print(f'======= parity vs torchdiffeq | {method} | 1e-7 =======')
        ratios, ratios_exec, diffs = [], [], []
        for name in names:
            if name == 'C5':
                # the reference's C5 has a data typo + interaction-sign flip
                # (see detest.py); trajectories are not comparable.
                continue
            est, nfe, _, _, nexec = solve(name, method, 1e-7,
                                          options=our_opts, count_evals=True)

            diffeq, init, _ = detest.ALL_PROBLEMS[name]()
            t0, y0 = init()

            class Counter:
                def __init__(self):
                    self.nfe = 0

                def __call__(self, t, y, perturb=None):
                    self.nfe += 1
                    return torch.as_tensor(
                        np.asarray(diffeq(jnp.asarray(float(t)),
                                          jnp.asarray(y.detach().numpy()))))

            f = Counter()
            tt = torch.tensor([float(t0), 20.0])
            yt = torch_odeint(f, torch.as_tensor(np.asarray(y0)), tt,
                              rtol=1e-7, atol=1e-7, method=method,
                              options=dict(ref_opts) if ref_opts else None)
            ratio = nfe / f.nfe
            ratio_exec = nexec / f.nfe
            diff = float(np.max(np.abs(np.asarray(est) - yt[1].numpy())
                                / (1e-8 + np.abs(yt[1].numpy()))))
            ratios.append(ratio)
            ratios_exec.append(ratio_exec)
            diffs.append(diff)
            print(f'{name}: NFE ours {nfe} (exec {nexec}) vs ref {f.nfe} '
                  f'(reported ratio {ratio:.3f}, exec ratio '
                  f'{ratio_exec:.3f}) | max rel diff {diff:.2e}')
        print(f'NFE ratio geomean {gmean(ratios):.4f} '
              f'(exec {gmean(ratios_exec):.4f}) | '
              f'worst trajectory diff {max(diffs):.2e}')
        summary.append((method, gmean(ratios), gmean(ratios_exec),
                        max(diffs)))

    print('\n======= parity summary =======')
    print('(reported = Stats.nfe convention; exec = executed-eval count, '
          'the reference Counter convention)')
    for method, g, ge, worst in summary:
        print(f'{method:17s} NFE-ratio geomean {g:.4f} | exec {ge:.4f} | '
              f'worst traj diff {worst:.2e}')


if __name__ == '__main__':
    main()
