from .jobs import work_queue, hourly_rollup, events_stream, session_windows

__all__ = ["work_queue", "hourly_rollup", "events_stream",
           "session_windows"]
