"""README claims must match the artifacts they cite (VERDICT r3 item 6).

The C2 parity count drifts run-to-run at the ULP level (see
tests/DETEST/C2_ANALYSIS.md), so README's "<N>/<M> combos exact" claim has
needed manual re-syncs.  This test recomputes the count from the cited
RESULTS_r*.txt snapshot and checks the headline perf percentages against
benchmarks/PERF.md, so any future drift fails the suite instead of
silently rotting.
"""
import os
import re

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

ADAPTIVE6 = ['dopri5', 'dopri8', 'tsit5', 'bosh3', 'fehlberg2',
             'adaptive_heun']


def _read(path):
    with open(path) as f:
        return f.read()


@pytest.fixture(scope='module')
def readme():
    return _read(os.path.join(ROOT, 'README.md'))


def test_parity_count_matches_cited_snapshot(readme):
    m = re.search(r'(\d+)/(\d+) problem.method combos are exact', readme)
    assert m, "README no longer states the exact-combo parity count"
    claimed_exact, claimed_total = int(m.group(1)), int(m.group(2))

    cited = re.search(r'tests/DETEST/(RESULTS_r\d+\.txt)', readme)
    assert cited, "README no longer cites a RESULTS_r*.txt snapshot"
    snap = _read(os.path.join(HERE, 'DETEST', cited.group(1)))

    # count NFE-exact combos among the six adaptive methods' parity blocks
    exact = total = 0
    method = None
    for line in snap.splitlines():
        hdr = re.match(r'=+ parity vs torchdiffeq \| (\S+) \|', line)
        if hdr:
            method = hdr.group(1)
            continue
        # r4 format: "A1: NFE ours 224 vs ref 224"; r5 adds the executed-
        # eval count: "A1: NFE ours 224 (exec 224) vs ref 224"
        row = re.match(r'\S+: NFE ours (\d+)(?: \(exec \d+\))? vs ref (\d+)',
                       line)
        if row and method in ADAPTIVE6:
            total += 1
            if row.group(1) == row.group(2):
                exact += 1

    assert total == claimed_total, (
        f"README claims /{claimed_total} but {cited.group(1)} has {total} "
        f"adaptive parity rows")
    assert exact == claimed_exact, (
        f"README claims {claimed_exact}/{claimed_total} exact but "
        f"{cited.group(1)} shows {exact}/{total} — re-sync README (the C2 "
        f"ULP drift mechanism is documented in C2_ANALYSIS.md)")


def test_parity_geomean_range_covers_snapshot(readme):
    m = re.search(r'NFE ratio geomean\s+([\d.]+)[-–]([\d.]+)', readme)
    if m is None:
        m = re.search(r'geomean\s+([\d.]+)[-–]([\d.]+)', readme)
    assert m, "README no longer states the NFE-ratio geomean range"
    lo, hi = float(m.group(1)), float(m.group(2))

    cited = re.search(r'tests/DETEST/(RESULTS_r\d+\.txt)', readme)
    snap = _read(os.path.join(HERE, 'DETEST', cited.group(1)))
    geos = []
    method = None
    for line in snap.splitlines():
        hdr = re.match(r'=+ parity vs torchdiffeq \| (\S+) \|', line)
        if hdr:
            method = hdr.group(1)
        g = re.match(r'NFE ratio geomean ([\d.]+)', line)
        if g and method in ADAPTIVE6:
            geos.append(float(g.group(1)))
    assert geos, "snapshot has no geomean lines"
    assert min(geos) >= lo - 5e-4 and max(geos) <= hi + 5e-4, (
        f"README geomean range [{lo}, {hi}] does not cover the snapshot's "
        f"[{min(geos)}, {max(geos)}]")


def test_perf_md_sections_all_measured_and_fresh():
    """VERDICT r4 item 1: every PERF.md section must carry a regeneration
    stamp (emitted by benchmarks/sweep.py, no hand edits), none may be
    'NEVER', and no section may be more than 7 days older than the newest
    one — a stale-section mix (round-3 tables in a round-4 file) fails."""
    import datetime

    perf = _read(os.path.join(ROOT, 'benchmarks', 'PERF.md'))
    assert '## Regeneration stamps' in perf, (
        "PERF.md lost its stamps section — regenerate with sweep.py")
    assert 'NEVER' not in perf, "PERF.md has never-measured sections"

    stamps = re.findall(r'^\| (\w+) \| (\d{4}-\d{2}-\d{2}) \d{2}:\d{2} \|',
                        perf, re.MULTILINE)
    assert len(stamps) >= 10, f"expected >=10 section stamps, got {stamps}"
    dates = [datetime.date.fromisoformat(d) for _, d in stamps]
    spread = (max(dates) - min(dates)).days
    assert spread <= 7, (
        f"PERF.md mixes measurement dates {min(dates)}..{max(dates)} "
        f"({spread} days apart) — rerun `python benchmarks/sweep.py` "
        f"(or `--sections` for the stale ones)")


def test_perf_percentages_match_perf_md(readme):
    perf = _read(os.path.join(ROOT, 'benchmarks', 'PERF.md'))

    m = re.search(r'([\d.]+)% of the chip.s bf16 matmul peak', readme)
    assert m, "README no longer states the stage-chain roofline claim"
    assert f"{m.group(1)}%" in perf, (
        f"README claims {m.group(1)}% of bf16 peak but PERF.md does not "
        f"contain that figure — regenerate one of them")

    m = re.search(r'~(\d+)% MFU\*?\*? in bf16', readme)
    assert m, "README no longer states the training-step MFU claim"
    claimed = int(m.group(1))
    # PERF.md training-step table rows: | ... | TFLOP/s | NN.N% |
    mfus = [float(x) for x in re.findall(
        r'\|\s*([\d.]+)%\s*\|\s*$', perf, re.MULTILINE)]
    assert mfus, "PERF.md has no MFU percentage cells"
    assert any(abs(claimed - v) <= 3 for v in mfus), (
        f"README claims ~{claimed}% MFU but PERF.md MFU cells are {mfus}")
