"""Import every query module so REGISTRY is fully populated.

Numbering note: q62 is absent — the id was skipped when q58-q66 were
authored as a batch and was never assigned. Coverage accounting must
use ``len(REGISTRY)`` (the source of truth), never the max id or any
hard-coded count.
"""

from .registry import REGISTRY, QuerySpec, query  # noqa: F401
from . import relational  # noqa: F401
from . import relational2  # noqa: F401
from . import relational3  # noqa: F401
from . import relational4  # noqa: F401
from . import relational5  # noqa: F401
from . import relational6  # noqa: F401
from . import scalar2  # noqa: F401
from . import merge_ops  # noqa: F401
from . import etl2  # noqa: F401
from . import events  # noqa: F401
from . import events2  # noqa: F401
from . import events3  # noqa: F401
from . import events4  # noqa: F401
from . import text  # noqa: F401
from . import text2  # noqa: F401
from . import text3  # noqa: F401
from . import text4  # noqa: F401
from . import text5  # noqa: F401
from . import graph2  # noqa: F401
from . import vector  # noqa: F401
from . import vector2  # noqa: F401
from . import vector3  # noqa: F401
from . import vector4  # noqa: F401
from . import vector5  # noqa: F401
from . import vector6  # noqa: F401
from . import vector7  # noqa: F401
from . import multimodal_q  # noqa: F401
from . import scale2  # noqa: F401
from . import scale3  # noqa: F401
from . import scale4  # noqa: F401
from . import scale5  # noqa: F401
from . import jobs  # noqa: F401
from . import planning  # noqa: F401
from . import spectral  # noqa: F401
from . import privacy  # noqa: F401
from . import monitor  # noqa: F401
from . import corpus  # noqa: F401
from . import curation  # noqa: F401
