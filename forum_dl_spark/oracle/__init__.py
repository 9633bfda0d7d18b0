"""Sequential oracle simulator.

The reference package cannot be imported in this container (bs4/dateparser
missing), so tests compare the Spark engine against a faithful sequential
re-execution of the reference's control flow — same seen-set semantics
(forum_dl/session.py:90-150), same detection cascade order
(forum_dl/extractors/__init__.py:12-24), same extractor traversal and writer
emission order (forum_dl/writers/common.py:100-129) — implemented here from
the cited sources, NOT copied.
"""

from .refsim import OracleResult, run_reference_discourse
from .session import AlreadyFailedError, AlreadyVisitedError, OracleSession

__all__ = [
    "OracleResult",
    "run_reference_discourse",
    "OracleSession",
    "AlreadyVisitedError",
    "AlreadyFailedError",
]
