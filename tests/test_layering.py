"""Import-layering lint: the runChecks.py analog (SURVEY.md §2.6).

The reference machine-enforces its include DAG (rev -> prim, mat -> arr ->
scal).  Our layer order:

    utils/special (L0)  <-  transforms/ops (L1)  <-  dists (L2)
        <-  model/functional (L3)  <-  infer (L4)  <-  parallel (L5)

Lower layers must not import higher ones.
"""

import ast
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "math_tpu")

LAYER = {
    "utils": 0,
    "special": 0,
    "config": 0,
    "testing": 0,
    "transforms": 1,
    "ops": 1,
    "dists": 2,
    "model": 3,
    "functional": 3,
    "diagnostics": 3,
    "io": 3,
    "infer": 4,
    "models": 4,
    "parallel": 5,
}


def _module_layer(parts):
    return LAYER.get(parts[0], None) if parts else None


def _imports_of(path):
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module:
            yield node.module
        elif isinstance(node, ast.Import):
            for a in node.names:
                yield a.name


def test_layer_dag():
    violations = []
    for dirpath, _, files in os.walk(ROOT):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
            parts = rel.replace(".py", "").split("/")
            src_layer = _module_layer(parts)
            if src_layer is None:
                continue
            for mod in _imports_of(path):
                if not mod.startswith("math_tpu."):
                    continue
                tgt_parts = mod.split(".")[1:]
                tgt_layer = _module_layer(tgt_parts)
                if tgt_layer is not None and tgt_layer > src_layer:
                    violations.append(f"{rel} (L{src_layer}) -> {mod} (L{tgt_layer})")
    assert not violations, "layering violations:\n" + "\n".join(violations)
