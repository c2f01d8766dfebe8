-- test data (reference 00_prepare.sql part 1)
drop table if exists tbl_index_case;
drop table if exists tbl_with_pk;

CREATE TABLE tbl_index_case
(
    id bigint,
    text_fld text,
    text_fld_2 character varying(10),
    fld_1 integer,
    fld_2 integer,
    fld_3 integer
) USING parquet;

CREATE INDEX tbl_index_case_text_fld_idx ON tbl_index_case (text_fld) WITH (fillfactor = 100);
CREATE INDEX tbl_index_case_text_fld_idx1 ON tbl_index_case using hash (text_fld);

INSERT INTO tbl_index_case (id, text_fld, text_fld_2, fld_1, fld_2, fld_3)
    SELECT T.v, T.v || 'abcdabcdabcdabcdabcdabcdabcd', 'v', T.v, T.v, T.v
    FROM (
        select generate_series(1, 100000) as v
    ) T;

CREATE INDEX tbl_index_case_text_fld_idx2 ON tbl_index_case using btree (text_fld, fld_1, fld_2, fld_3);
CREATE INDEX tbl_index_case_text_fld_idx3 ON tbl_index_case (text_fld_2);
CREATE INDEX tbl_index_case_fld_1_idx4 ON tbl_index_case using btree (fld_1);
CREATE INDEX tbl_index_case_text_fld_idx_dub_1 ON tbl_index_case using btree (fld_1);
CREATE INDEX tbl_index_case_text_fld_idx_dub_2 ON tbl_index_case using btree (fld_1, fld_2);
CREATE INDEX tbl_index_case_text_fld_idx_dub_3 ON tbl_index_case using btree (fld_1, fld_2, fld_3);
CREATE INDEX tbl_index_case_text_fld_idx_dub_4 ON tbl_index_case using btree (fld_3, fld_2, fld_1);
CREATE INDEX tbl_index_case_text_fld_idx_dub_5 ON tbl_index_case using btree (fld_1);

CREATE TABLE tbl_with_pk
(
    id bigint,
    text_fld text,
    fld_1 integer,
    fld_2 integer,
    fld_3 integer
) USING parquet;
CREATE UNIQUE INDEX tbl_with_pk_pkey ON tbl_with_pk (id);

analyze tbl_index_case;
