from gpry_tpu.acquisition.functions import (  # noqa: F401
    AcquisitionFunction,
    ConstantAcqFunc,
    ExpectedImprovement,
    LogExp,
    Mu,
    NonlinearLogExp,
    Std,
    builtin_names,
    is_acquisition_function,
)
from gpry_tpu.acquisition.batch_optimizer import BatchOptimizer  # noqa: F401
from gpry_tpu.acquisition.nora import NORA  # noqa: F401
from gpry_tpu.acquisition.ranked_pool import RankedPool  # noqa: F401
