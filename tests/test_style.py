"""In-repo style lint: the cpplint/clang-format analog (SURVEY.md §2.6).

No third-party linters are vendored, so this enforces the project's
mechanical conventions directly: line length, tabs, trailing whitespace,
`import *` confinement, and module docstrings across ``math_tpu`` and
``tests``.
"""

import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
MAX_LINE = 100  # library source
MAX_LINE_TEST = 160  # tests/benches may hold dense oracle tables
STAR_IMPORT_OK = {"math_tpu/ops/__init__.py", "math_tpu/dists/__init__.py"}


def _py_files():
    for top in ("math_tpu", "tests", "benches"):
        for dirpath, _, files in os.walk(os.path.join(ROOT, top)):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    yield os.path.relpath(
                        os.path.join(dirpath, fn), ROOT
                    ).replace(os.sep, "/")


@pytest.mark.parametrize("rel", list(_py_files()))
def test_style(rel):
    path = os.path.join(ROOT, rel)
    with open(path, encoding="utf-8") as f:
        src = f.read()
    problems = []
    for i, line in enumerate(src.splitlines(), 1):
        if "\t" in line:
            problems.append(f"{rel}:{i}: tab character")
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        limit = MAX_LINE if rel.startswith("math_tpu") else MAX_LINE_TEST
        if len(line) > limit and "http" not in line:
            problems.append(f"{rel}:{i}: line length {len(line)} > {limit}")
        if line.rstrip().endswith("import *") and rel not in STAR_IMPORT_OK:
            problems.append(f"{rel}:{i}: star import outside allowlist")
    if rel.startswith("math_tpu") and not rel.endswith("__init__.py"):
        stripped = src.lstrip()
        if not (stripped.startswith('"""') or stripped.startswith('r"""')):
            problems.append(f"{rel}:1: missing module docstring")
    assert not problems, "\n".join(problems)
