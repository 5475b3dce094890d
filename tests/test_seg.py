"""SEG filter fuzz parity against the NCBI C implementation (harness built
from the reference's vendored objects; skipped when unavailable)."""

import os
import random
import subprocess

import pytest

from kaiju_tpu.engine.seg import SegFilter

HARNESS = os.environ.get("KAIJU_SEG_HARNESS", "/tmp/segharness/segharness")

needs_harness = pytest.mark.skipif(
    not os.path.exists(HARNESS), reason="C SEG harness not built"
)

AA20 = "ACDEFGHIKLMNPQRSTVWY"


def _gen_cases(rng, n):
    cases = [
        "AAAAAAAAAAAAAAAAKLMNPQRSTVW",
        "KLMNPQRSTVWACDEFGH",
        "SSSSSSSSSSKKKKKKKKKK",
        "A" * 11,  # below window
        "A" * 12,
        "A" * 200,
        "PA" * 40,
        "PAV" * 30,
        ("S" * 15 + "KLMNPQRSTVWYACDE" + "Q" * 18) * 2,
    ]
    for i in range(n):
        kind = i % 6
        ln = rng.randint(12, 300)
        if kind == 0:
            s = "".join(rng.choice(AA20) for _ in range(ln))
        elif kind == 1:
            s = "".join(rng.choice("AS") for _ in range(ln))
        elif kind == 2:
            s = "".join(rng.choice("ASK") for _ in range(ln))
        elif kind == 3:  # islands
            s = ""
            while len(s) < ln:
                if rng.random() < 0.5:
                    s += rng.choice(AA20) * rng.randint(3, 20)
                else:
                    s += "".join(rng.choice(AA20) for _ in range(rng.randint(3, 20)))
        elif kind == 4:  # periodic
            unit = "".join(rng.choice(AA20) for _ in range(rng.randint(1, 4)))
            s = (unit * (ln // len(unit) + 1))[:ln]
        else:  # mostly random with one run
            s = "".join(rng.choice(AA20) for _ in range(ln))
            p = rng.randrange(len(s))
            s = s[:p] + rng.choice(AA20) * rng.randint(6, 30) + s[p:]
        cases.append(s)
    return cases


@needs_harness
def test_seg_fuzz_vs_c():
    rng = random.Random(4242)
    cases = _gen_cases(rng, 400)
    res = subprocess.run(
        [HARNESS],
        input="\n".join(cases) + "\n",
        capture_output=True,
        text=True,
        check=True,
    )
    want_lines = res.stdout.splitlines()
    seg = SegFilter()
    assert len(want_lines) == len(cases)
    for s, want in zip(cases, want_lines):
        got = "".join(f"{a}-{b};" for a, b in seg.mask_intervals(s))
        assert got == want, f"seq={s!r}\nmine={got}\nref ={want}"


def test_seg_basic():
    seg = SegFilter()
    assert seg.mask_intervals("KLMNPQRSTVWACDEFGH") == []
    ivs = seg.mask_intervals("AAAAAAAAAAAAAAAAKLMNPQRSTVW")
    assert ivs and ivs[0][0] == 0
    assert seg.mask_intervals("A" * 11) == []  # shorter than window
