from . import step_pallas  # noqa: F401
