from .registry import REGISTRY, QuerySpec, register  # noqa: F401

# Importing the modules below populates REGISTRY via @register.
from . import relational  # noqa: F401,E402
from . import scoring_queries  # noqa: F401,E402
from . import evidence_queries  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import textops  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import writes  # noqa: F401,E402
from . import collector_queries  # noqa: F401,E402
from . import ingest  # noqa: F401,E402
from . import streaming_queries  # noqa: F401,E402
from . import asof  # noqa: F401,E402
from . import skew  # noqa: F401,E402
from . import mllib_queries  # noqa: F401,E402
from . import sem_queries  # noqa: F401,E402
from . import graph  # noqa: F401,E402
from . import layout  # noqa: F401,E402
from . import entity  # noqa: F401,E402
from . import spatial  # noqa: F401,E402
