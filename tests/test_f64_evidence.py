"""contrast THRESHOLD evidence: executor error vs the float64 truth.

tests/checks.py loosens contrast's pass threshold to 1e-3 on the
grounds that XLA/Mosaic FMA contraction makes the executor MORE
accurate than the individually-rounded f32 oracle on cancelling
coefficient sums. VERDICT r3 #7: assert that, don't argue it. The same
check runs on real hardware in `tpu_validate --variants`
('contrast+f64truth'); this CPU run covers the interpret path and the
float64-oracle machinery (`double` evaluates in NumPy float64,
storage-honest, without jax x64).
"""

from soda_tpu.tools.tpu_validate import contrast_f64_check


def test_contrast_executor_at_least_as_close_to_f64_truth():
  err_exec, err_orac = contrast_f64_check()
  # 1.05x slack: individual cells may round either way; the claim is
  # the executor is not systematically worse than the f32 oracle
  assert err_exec <= err_orac * 1.05 + 1e-9, (err_exec, err_orac)
