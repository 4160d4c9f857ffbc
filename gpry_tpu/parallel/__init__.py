from gpry_tpu.parallel.executor import TruthExecutor  # noqa: F401
from gpry_tpu.parallel.rng import get_random_generator  # noqa: F401
