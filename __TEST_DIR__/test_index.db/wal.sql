CREATE TABLE tbl (i INTEGER);;
CREATE INDEX idx_drop ON tbl(i);;
CREATE INDEX idx ON tbl (i);;
CREATE TABLE integers(i integer);
CREATE INDEX i_index ON integers(i);
CREATE TABLE integers(i integer);
CREATE INDEX i_index ON integers(i);
