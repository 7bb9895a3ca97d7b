from .harness import Harness          # noqa: F401
from .testclock import TestClock      # noqa: F401
