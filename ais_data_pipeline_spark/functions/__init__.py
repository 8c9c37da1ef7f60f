"""Pure helpers: the integer downcast ladder (reference T6), vector
column expressions, text column expressions."""
