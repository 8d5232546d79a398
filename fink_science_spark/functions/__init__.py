"""Column-expression builders — the pure-SQL kernel of the engine."""
