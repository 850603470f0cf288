"""The reference tests import the standalone `mock` distribution; the
stdlib implementation is identical."""
from unittest.mock import *  # noqa: F401,F403
from unittest.mock import call, patch  # noqa: F401
