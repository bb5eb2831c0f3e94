"""Policy/value models and action distributions."""

from .distributions import Categorical, GaussianSquashedGaussian
from .export_rllib import export_policy_params
from .import_rllib import import_policy_params, load_rllib_checkpoint
from .mlp import init_mlp, mlp_apply, normc_init
from .policy import ActionDist, action_dist, forward, init_params

__all__ = (
    "Categorical", "GaussianSquashedGaussian",
    "export_policy_params", "import_policy_params", "load_rllib_checkpoint",
    "init_mlp", "mlp_apply", "normc_init",
    "ActionDist", "action_dist", "forward", "init_params",
)
