"""Status-code envelope contract.

Parity with the reference's code table (``cpp/include/task.h:12-61``): every
input row yields an envelope row with a ``code`` — errors are data, never
exceptions escaping a ``map_batches`` stage.  Win32 clipboard codes (21x) are
intentionally not carried over (deprecated platform shim).
"""

CODE_INIT = 0

# success
CODE_OK = 100        # text found
CODE_OK_NONE = 101   # recognised successfully but no text

# path-read failures (cpp/include/task.h:19-26)
CODE_ERR_PATH_EXIST = 200   # image path does not exist
CODE_ERR_PATH_CONV = 201    # path conversion failure (kept for parity; unused)
CODE_ERR_PATH_READ = 202    # path exists but open failed
CODE_ERR_PATH_DECODE = 203  # opened but bytes not decodable

# base64 failures (cpp/include/task.h:50-53)
CODE_ERR_BASE64_DECODE = 300     # base64 string -> bytes failed
CODE_ERR_BASE64_IM_DECODE = 301  # bytes not decodable as an image

# json / task failures (cpp/include/task.h:55-61)
CODE_ERR_JSON_DUMP = 400
CODE_ERR_JSON_PARSE = 401
CODE_ERR_JSON_PARSE_KEY = 402
CODE_ERR_NO_TASK = 403


def msg_ok_none(path: str) -> str:
    return f'No text found in image. Path: "{path}"'


def msg_path_exist(path: str) -> str:
    return f'Image path dose not exist. Path: "{path}"'  # sic — reference typo kept


def msg_path_read(path: str) -> str:
    return f'Image open failed. Path: "{path}"'


def msg_path_decode(path: str) -> str:
    return f'Image decode failed. Path: "{path}"'


MSG_BASE64_DECODE = "Base64 decode failed."
MSG_BASE64_IM_DECODE = "Base64 data imdecode failed."
MSG_NO_TASK = "No valid tasks."
