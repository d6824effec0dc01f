"""The axon tunnel's op journal retains every H2D payload unless
compaction is on (measured: +6.2 MB/call vs ~0 — scripts/leak_probe.py,
r5 soak). Importing ics_tpu must arm AXON_JOURNAL_COMPACT before any
device use, and must not stomp an operator's explicit setting."""

import importlib
import os
import subprocess
import sys


def test_import_sets_journal_compact_default():
    import ics_tpu  # noqa: F401

    assert os.environ.get("AXON_JOURNAL_COMPACT") == "1"


def test_explicit_operator_value_wins():
    # setdefault semantics: a pre-set value (e.g. "0" to debug a session
    # rebind) must survive the import
    code = (
        "import os; os.environ['AXON_JOURNAL_COMPACT'] = '0'; "
        "import ics_tpu; "
        "assert os.environ['AXON_JOURNAL_COMPACT'] == '0'"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(sys.path)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=120)


def test_entry_points_import_ics_tpu_before_device_use():
    # bench.py and __graft_entry__.py are the driver's two direct entry
    # points: both must import the package (arming the env default)
    # before anything touches jax devices
    root = os.path.join(os.path.dirname(__file__), "..")
    for fname in ("bench.py", "__graft_entry__.py"):
        with open(os.path.join(root, fname)) as f:
            src = f.read()
        imp = src.find("import ics_tpu")
        dev = src.find("jax.devices(")
        assert imp != -1, f"{fname} never imports ics_tpu"
        assert dev == -1 or imp < dev, (
            f"{fname} touches jax.devices() before importing ics_tpu "
            f"(AXON_JOURNAL_COMPACT default would not be armed)"
        )


def test_module_reimport_is_idempotent():
    import ics_tpu

    importlib.reload(ics_tpu)
    assert os.environ.get("AXON_JOURNAL_COMPACT") == "1"
