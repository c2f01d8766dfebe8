from db_converter_spark.plans.model import (  # noqa: F401
    CommandType,
    DBCResult,
    PacketStatus,
    PacketType,
    ResultCode,
)
from db_converter_spark.plans.packet import Packet, parse_packet  # noqa: F401
from db_converter_spark.plans.runner import PacketRunner  # noqa: F401
