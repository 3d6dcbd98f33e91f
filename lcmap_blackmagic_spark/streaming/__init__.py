from .jobs import (work_queue, hourly_rollup, events_stream,
                   session_windows, dedup_stream)

__all__ = ["work_queue", "hourly_rollup", "events_stream",
           "session_windows", "dedup_stream"]
