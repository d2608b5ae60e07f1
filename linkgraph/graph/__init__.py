"""Graph operators: edges, triangles, truss, components, pagerank, lpa."""
