select id, concat('row_', id) as label from range(1, 51)
