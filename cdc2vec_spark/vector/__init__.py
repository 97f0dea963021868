"""Vector math over array<float> columns — pure Spark SQL expressions."""
