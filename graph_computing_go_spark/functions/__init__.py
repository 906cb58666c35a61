from graph_computing_go_spark.functions.entropy import (  # noqa: F401
    degree_distribution_entropy,
    degree_histogram,
    degrees,
    structural_entropy,
)
from graph_computing_go_spark.functions.multilayer import (  # noqa: F401
    multilayer_structural_entropy,
)
from graph_computing_go_spark.functions.ngd import google_distance  # noqa: F401
from graph_computing_go_spark.functions.distance_complexity import (  # noqa: F401
    distance_complexity,
)
