from . import tableaus, rk_step, interp, step_control, adams_coeffs  # noqa: F401
