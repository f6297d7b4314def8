from graphragdatapipeline_spark.graph.model import PropertyGraph  # noqa: F401
from graphragdatapipeline_spark.graph.algorithms import (  # noqa: F401
    connected_components,
    degrees,
    detect_communities,
    label_propagation,
    transitive_closure,
    two_hop,
)
