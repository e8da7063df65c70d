"""Plan-inspection helpers: assert the physical plan has the shape we
designed for (pushdown, broadcast, partial aggregation)."""
