from .merge import precedence_merge, unmatched_audit, audit_summary  # noqa: F401
from .asof import asof_join  # noqa: F401
