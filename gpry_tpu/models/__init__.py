from gpry_tpu.models.gp import GaussianProcessRegressor  # noqa: F401
from gpry_tpu.models.classifier import SVM  # noqa: F401
