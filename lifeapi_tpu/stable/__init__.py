from . import bitplane, complete, host, nibble, options, propagate, rules_vec, ternary  # noqa: F401
from .complete import (  # noqa: F401
    CompletionResult, complete_stable, complete_stable_beam,
    complete_stable_beam_queued, complete_stable_portfolio,
)
from .propagate import Stable  # noqa: F401
