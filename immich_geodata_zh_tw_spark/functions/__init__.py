"""Column-level functions (JVM-side wherever possible; UDFs only for geometry)."""
