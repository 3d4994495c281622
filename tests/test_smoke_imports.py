"""Fast-tier health guard for the slow tier (and everything else).

The full suite takes ~45 min (e2e deploy parity, notebook execution);
between full runs nothing guarded against import/config rot in those
modules. These smoke tests run in seconds and catch an injected break
in every slow module's import/config path:

* every ``mixdq_tpu`` submodule imports
* every test module imports (collect-time breaks surface here)
* every CLI script under ``scripts/`` imports (main() stays unexecuted)
* every notebook parses and its code cells compile
* every YAML config parses
"""

import importlib
import importlib.util
import json
import os
import pkgutil
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_library_modules_import():
    import mixdq_tpu

    failures = []
    for m in pkgutil.walk_packages(mixdq_tpu.__path__,
                                   prefix="mixdq_tpu."):
        try:
            importlib.import_module(m.name)
        except Exception as e:  # pragma: no cover - failure reporting
            failures.append(f"{m.name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_all_test_modules_import():
    tests_dir = os.path.join(REPO, "tests")
    failures = []
    for fn in sorted(os.listdir(tests_dir)):
        if not (fn.startswith("test_") and fn.endswith(".py")):
            continue
        spec = importlib.util.spec_from_file_location(
            f"_smoke_{fn[:-3]}", os.path.join(tests_dir, fn))
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except pytest.skip.Exception:
            pass  # module-level importorskip
        except Exception as e:  # pragma: no cover
            failures.append(f"{fn}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


def test_all_scripts_import():
    scripts_dir = os.path.join(REPO, "scripts")
    failures = []
    for fn in sorted(os.listdir(scripts_dir)):
        if not fn.endswith(".py"):
            continue
        spec = importlib.util.spec_from_file_location(
            f"_smoke_script_{fn[:-3]}", os.path.join(scripts_dir, fn))
        mod = importlib.util.module_from_spec(spec)
        try:
            spec.loader.exec_module(mod)
        except Exception as e:  # pragma: no cover
            failures.append(f"{fn}: {type(e).__name__}: {e}")
        else:
            assert hasattr(mod, "main") or fn.startswith("_"), fn
    assert not failures, "\n".join(failures)


def test_notebooks_parse_and_compile():
    nb_dir = os.path.join(REPO, "notebooks")
    seen = 0
    for fn in sorted(os.listdir(nb_dir)):
        if not fn.endswith(".ipynb"):
            continue
        seen += 1
        nb = json.load(open(os.path.join(nb_dir, fn)))
        for i, cell in enumerate(nb["cells"]):
            if cell["cell_type"] != "code":
                continue
            src = "".join(cell["source"])
            src = "\n".join(l for l in src.splitlines()
                            if not l.lstrip().startswith(("%", "!")))
            compile(src, f"{fn}:cell{i}", "exec")
    assert seen >= 2  # error_plot + distribution


def test_all_yaml_configs_parse():
    import yaml

    seen = 0
    for root, _, files in os.walk(os.path.join(REPO, "configs")):
        for fn in files:
            if fn.endswith((".yaml", ".yml")):
                seen += 1
                with open(os.path.join(root, fn)) as f:
                    assert yaml.safe_load(f) is not None, fn
    assert seen >= 8
