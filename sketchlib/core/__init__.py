"""Pure-numpy sketch kernels. No Spark imports allowed in this subpackage."""
