"""The driver-visible multi-chip check must pass (VERDICT round 1, item 1).

Calls ``__graft_entry__.dryrun_multichip(8)`` directly — the same entry the
driver invokes — so the self-provisioning + full sharded train step is gated
by the test suite, not just by the driver run.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_8():
    # conftest already provisions an 8-device CPU backend; dryrun must detect
    # that and run in-process (no subprocess fallback needed).
    __graft_entry__.dryrun_multichip(8)


def test_provision_detects_existing_devices():
    assert __graft_entry__._provision_devices(8) is True
    assert __graft_entry__._provision_devices(1) is True
