"""XL multi-chip capacity assertion (VERDICT round-3 item 4).

Runs the capacity accounting from scripts/multichip_capacity.py for the
reference 512px recipes on the fake 8-device mesh: exact per-device resident
bytes under the real ZeRO-2 NamedShardings + the real-chip-measured grad
temp-arena bound + the AOT-compiled sharded apply graph. Asserts the XL
training step fits 15.75 GiB/device WITH fp32 moments/EMA/accumulator - the
"multi-chip lifts the single-chip stage-3/4 cap" claim.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_xl_zero2_fits_per_device_hbm():
    from multichip_capacity import HBM_LIMIT_GIB, SCENARIOS, lower_scenario

    for name, mask, mb, clip in SCENARIOS:
        rec = lower_scenario(name, mask, mb, clip)
        assert rec["fits"], rec
        assert rec["peak_per_device_gib"] < HBM_LIMIT_GIB, rec
        # the resident state must actually be SHARDED (ZeRO-2): a replicated
        # layout would put ~18.6 GiB of fp32 state per device
        assert rec["resident_per_device_gib"] < 8.0, rec
        # params replicated (SHARD_GRAD_OP parity), not fsdp-sharded
        assert rec["resident_detail_gib"]["params_replicated"] > 4.0, rec
        # ICI comm model (VERDICT r4 #7): each microbatch's fp32 grad
        # reduce-scatter must hide under the measured grad compute, leaving
        # only the last-RS + all-gather tail exposed per update
        comm = rec["comm_model"]
        assert comm["rs_hides_under_compute"], comm
        assert comm["overlapped_comm_overhead_pct"] < 5.0, comm
