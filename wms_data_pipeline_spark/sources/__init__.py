"""Sources & sinks — landing zone I/O and the paginated REST source."""
