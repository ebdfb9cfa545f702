from . import bitplane, complete, host, nibble, options, propagate, rules_vec, ternary  # noqa: F401
from .complete import CompletionResult, complete_stable, complete_stable_beam  # noqa: F401
from .propagate import Stable  # noqa: F401
