"""Every Pallas kernel, compiled on the chip, vs its XLA reference.

The CPU test tier (tests/test_kernels.py etc.) runs the same kernels under
the Pallas interpreter; this closes the "tested where it runs" gap.  The
driver's bench run performs the same checks via bench.py (shared
implementation: thunder_tpu.kernels.selftest).
"""

import pytest

from thunder_tpu.kernels.selftest import KERNEL_CHECKS, run_selftests


@pytest.mark.parametrize("name", sorted(KERNEL_CHECKS))
def test_kernel_compiled_numerics(name):
    (result,) = run_selftests([name])
    assert "error" not in result, result
    assert result["ok"], f"{name}: max_err {result['max_err']} > tol {result['tol']}"
