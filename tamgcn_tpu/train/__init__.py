"""Training runtime: config system, session, optimiser, checkpoints, trainer."""
from .config import base_parser, load_config  # noqa: F401
from .session import Session  # noqa: F401
