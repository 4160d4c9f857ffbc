from gpry_tpu.ops.kernels import (  # noqa: F401
    KERNEL_FAMILIES,
    cross_kernel,
    kernel_diag,
    make_theta,
    theta_bounds_dynamic,
)
from gpry_tpu.ops.linalg import (  # noqa: F401
    masked_cholesky,
    masked_lml,
    chol_append,
    solve_lower,
)
