from .pipeline import (  # noqa: F401
    add_timestamp,
    calculate_field,
    field_filters,
    flatten_nested,
    parse_json_field,
    read_stream_files,
    read_stream_kafka,
    rename_field,
    sessionized_stream,
    sliding_stream,
    tumbling_stream,
    write_stream,
)
