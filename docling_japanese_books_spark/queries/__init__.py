"""Query registry package — importing it loads every query module so
``relational.REGISTRY`` is fully populated."""

from . import relational  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import extraction_queries  # noqa: F401
from . import curation_queries  # noqa: F401
from . import eval_queries  # noqa: F401
from . import pdf_queries  # noqa: F401
from . import misc_queries  # noqa: F401
from . import analytics_queries  # noqa: F401
from . import late_queries  # noqa: F401
from . import structure_queries  # noqa: F401
from . import dataset_queries  # noqa: F401
from . import office_queries  # noqa: F401
from .relational import REGISTRY  # noqa: F401
