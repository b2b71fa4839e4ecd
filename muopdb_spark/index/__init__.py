from muopdb_spark.index.ivf import IvfIndex, build_ivf, ivf_search  # noqa: F401
from muopdb_spark.index.ivf import ivf_load, ivf_save  # noqa: F401
from muopdb_spark.index.pq import PqCodebook, pq_encode, pq_search, train_pq  # noqa: F401
from muopdb_spark.index.rabitq import (  # noqa: F401
    RabitQCodebook,
    rabitq_encode,
    rabitq_search,
    train_rabitq,
)
